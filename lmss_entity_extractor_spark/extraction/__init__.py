from .candidates import generate_candidates  # noqa: F401
from .merge import resolve_spans  # noqa: F401
from .turn import extract_mentions_from_turn, extract_mentions_from_turns  # noqa: F401
