"""Streaming heavy hitters (L106) — sharded Misra-Gries in the state store."""

import pandas as pd
import pytest

from lmss_entity_extractor_spark.streaming.stateful import streaming_heavy_hitters


def _write_tokens(path, tokens):
    pd.DataFrame({"tok": tokens}).to_parquet(path)


def _run(spark, tmp_path, name, k=64, shards=4):
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "toks"))
    )
    q = (
        streaming_heavy_hitters(stream, "tok", k=k, shards=shards)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # latest update per item: counts are per-shard cumulative, so the
    # max count_est row per item is its final state
    return {
        r["item"]: (r["count_est"], r["max_undercount"])
        for r in spark.sql(
            f"SELECT item, max_by(count_est, count_est) AS count_est, "
            f"max_by(max_undercount, count_est) AS max_undercount "
            f"FROM {name} GROUP BY item"
        ).collect()
    }


@pytest.mark.spark
def test_exact_when_no_eviction_and_accumulates(spark, tmp_path):
    tdir = tmp_path / "toks"
    tdir.mkdir()
    _write_tokens(tdir / "f1.parquet", ["a"] * 10 + ["b"] * 3 + ["c"])
    _write_tokens(tdir / "f2.parquet", ["a"] * 5 + ["b"] * 7 + ["d"] * 2)
    got = _run(spark, tmp_path, "hh_exact", k=64)
    # k >> vocab: no eviction, err 0, counts exact and cross-batch summed
    assert {i: c for i, (c, e) in got.items()} == {"a": 15, "b": 10, "c": 1, "d": 2}
    assert all(e == 0 for _, e in got.values())


@pytest.mark.spark
def test_mg_bounds_under_eviction(spark, tmp_path):
    tdir = tmp_path / "toks"
    tdir.mkdir()
    truth = {"hot": 80, "warm": 30}
    light = {f"w{i}": 2 for i in range(50)}
    truth.update(light)
    toks = [t for t, n in truth.items() for _ in range(n)]
    _write_tokens(tdir / "f1.parquet", toks[: len(toks) // 2])
    _write_tokens(tdir / "f2.parquet", toks[len(toks) // 2 :])
    got = _run(spark, tmp_path, "hh_evict", k=2, shards=1)
    assert got, "hot item must survive"
    for item, (est, err) in got.items():
        assert est <= truth[item] <= est + err  # the MG invariant
    # superset guarantee: any item with true count > err survived
    errs = [e for _, e in got.values()]
    max_err = max(errs)
    for item, n in truth.items():
        if n > max_err:
            assert item in got, f"{item} (n={n} > err={max_err}) evicted"


@pytest.mark.spark
def test_validation(spark, tmp_path):
    tdir = tmp_path / "toks"
    tdir.mkdir()
    _write_tokens(tdir / "f1.parquet", ["a"])
    stream = spark.readStream.schema("tok string").parquet(str(tdir))
    with pytest.raises(ValueError, match="k and shards"):
        streaming_heavy_hitters(stream, "tok", k=0)
