from .reference_oracle import oracle_extract, oracle_link, oracle_triples  # noqa: F401
