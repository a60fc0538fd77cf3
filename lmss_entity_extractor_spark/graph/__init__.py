from .closure import transitive_closure  # noqa: F401
from .triples import emit_triples  # noqa: F401
from .canonicalize import canonicalize_triples, build_nodes  # noqa: F401
from .export import edges_to_turtle  # noqa: F401
