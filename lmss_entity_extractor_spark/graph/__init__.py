from .closure import transitive_closure  # noqa: F401
from .triples import emit_triples  # noqa: F401
from .canonicalize import canonicalize_triples, build_nodes  # noqa: F401
