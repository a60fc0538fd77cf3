from .incremental import incremental_edges, compact_incremental_edges, streaming_turn_rate  # noqa: F401
from .stateful import conversation_running_totals  # noqa: F401
