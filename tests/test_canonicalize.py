"""Canonicalization (A7) and node assembly: salted dedup must be
salt-invariant, deterministic, and skew-safe."""

import pytest
from pyspark.sql import functions as F

from lmss_entity_extractor_spark.graph.canonicalize import canonicalize_triples


def _triples_df(spark):
    rows = []
    # hot key: one (s,p,o) repeated from 500 turns of one conversation
    for t in range(500):
        rows.append(("turn://hot/%d" % t, "prov:partOf", "conv://hot", "hot", t, 1.0))
        rows.append(("mention://hot/x", "lmss:isInstanceOf", "iri:A", "hot", t, 0.5 + (t % 5) / 10))
    # cold keys
    for c in range(50):
        rows.append((f"mention://c{c}", "lmss:isInstanceOf", "iri:B", f"conv-{c}", 0, 0.9))
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, conv_id string, turn_idx int, score float"
    )


@pytest.mark.spark
def test_dedup_counts_and_first_provenance(spark):
    edges = canonicalize_triples(_triples_df(spark), salt_buckets=16).collect()
    by_key = {(r.subj, r.pred, r.obj): r for r in edges}
    hot = by_key[("mention://hot/x", "lmss:isInstanceOf", "iri:A")]
    assert hot.n_provenances == 500
    assert hot.first_conv_id == "hot" and hot.first_turn_idx == 0
    assert hot.max_score == pytest.approx(0.9)
    assert len([k for k in by_key if k[2] == "iri:B"]) == 50
    # 500 distinct turn->conv subjects + 1 hot mention + 50 cold = 551
    assert len(edges) == 551


@pytest.mark.spark
@pytest.mark.parametrize("buckets", [1, 4, 64])
def test_salt_invariance(spark, buckets):
    base = {
        (r.subj, r.pred, r.obj, r.n_provenances, r.first_conv_id, r.first_turn_idx)
        for r in canonicalize_triples(_triples_df(spark), salt_buckets=16).collect()
    }
    other = {
        (r.subj, r.pred, r.obj, r.n_provenances, r.first_conv_id, r.first_turn_idx)
        for r in canonicalize_triples(_triples_df(spark), salt_buckets=buckets).collect()
    }
    assert base == other


@pytest.mark.spark
def test_phase1_bounds_rows_per_key(spark):
    """Structural skew property: after phase 1, no (s,p,o) key has more
    than salt_buckets rows — the phase-2 shuffle cannot see a hot key."""
    from lmss_entity_extractor_spark.graph.canonicalize import DEFAULT_SALT_BUCKETS

    df = _triples_df(spark)
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(DEFAULT_SALT_BUCKETS))
    phase1 = (
        df.groupBy("subj", "pred", "obj", salt.alias("_salt"))
        .count()
        .groupBy("subj", "pred", "obj")
        .count()
    )
    assert phase1.agg(F.max("count")).collect()[0][0] <= DEFAULT_SALT_BUCKETS
