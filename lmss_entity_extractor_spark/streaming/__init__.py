from .incremental import incremental_edges, compact_incremental_edges, streaming_turn_rate  # noqa: F401
