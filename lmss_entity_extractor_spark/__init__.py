"""lmss_entity_extractor_spark — PySpark-native LMSS knowledge-graph
construction engine.

A from-scratch re-expression of the query/data-processing capabilities of
JustlyAI/lmss_entity_extractor (SALI-E) as a batch PySpark pipeline over
tables of multi-turn conversation transcripts:

  transcripts -> mention detection (broadcast label/alias dictionary,
  Arrow-vectorized pandas UDF) -> candidate scoring + entity linking to
  LMSS class IRIs (vectorized cosine + fuzzy hybrid score, high-confidence
  fast path) -> (subj, pred, obj) triple emission with provenance ->
  salted-groupBy canonicalization -> partitioned nodes/edges graph tables,
  checkpoint-resumable.

All semantics derive from the public reference behavior (cited per module
as ``/root/reference/app/<file>:<lines>``); the implementation is
idiomatic Spark (DataFrame API + Arrow-batched pandas UDFs), not a port.
"""

__version__ = "0.1.0"
