from .reference_oracle import (  # noqa: F401
    oracle_edge_rows,
    oracle_extract,
    oracle_link,
    oracle_triples,
)
