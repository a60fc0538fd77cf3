"""Dictionary encoding (graph/dictenc.py, L61): dense sorted-order ids,
parallelism independence, encode/decode round-trip, join-compat ids."""

from lmss_entity_extractor_spark.graph.dictenc import (
    decode_triples,
    encode_triples,
    term_dictionary,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


GRAPH = [
    ("e:b", "p:knows", "e:a"),
    ("e:a", "p:knows", "e:c"),
    ("e:c", "p:type", "T:person"),
    ("e:a", "p:type", "T:person"),
    ("e:b", "p:type", "T:robot"),
]


class TestTermDictionary:
    def test_dense_sorted_ids(self, spark):
        d = {r["term"]: r["id"] for r in term_dictionary(_triples(spark, GRAPH)).collect()}
        terms = sorted({t for row in GRAPH for t in row})
        assert d == {t: i for i, t in enumerate(terms)}

    def test_parallelism_independent(self, spark):
        t = _triples(spark, GRAPH)
        a = term_dictionary(t.repartition(1), num_ranges=1)
        b = term_dictionary(t.repartition(7), num_ranges=5)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_empty(self, spark):
        assert term_dictionary(_triples(spark, [])).count() == 0


class TestEncodeDecode:
    def test_roundtrip(self, spark):
        t = _triples(spark, GRAPH)
        d = term_dictionary(t)
        back = decode_triples(encode_triples(t, d), d)
        assert sorted(map(tuple, back.collect())) == sorted(GRAPH)

    def test_encoded_values_hand_computed(self, spark):
        t = _triples(spark, GRAPH)
        d = term_dictionary(t)
        ids = {r["term"]: r["id"] for r in d.collect()}
        got = sorted(map(tuple, encode_triples(t, d).collect()))
        want = sorted((ids[s], ids[p], ids[o]) for s, p, o in GRAPH)
        assert got == want

    def test_ids_join_across_positions(self, spark):
        # "e:a" appears as subject and object: same id both places, so
        # an o_id=s_id self-join finds the knows-chain b->a->c (and only
        # chains — 2 hops in GRAPH: b->a->c and a->c->type-object none).
        t = _triples(spark, GRAPH)
        enc = encode_triples(t, term_dictionary(t))
        left = enc.selectExpr("s_id AS src", "o_id AS mid")
        right = enc.selectExpr("s_id AS mid", "o_id AS dst")
        d = {r["term"]: r["id"] for r in term_dictionary(t).collect()}
        hops = {
            (r["src"], r["dst"])
            for r in left.join(right, "mid").collect()
        }
        assert (d["e:b"], d["e:c"]) in hops
