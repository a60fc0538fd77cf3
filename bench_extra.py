"""Per-query noop-sink isolation bench (guide §1.4) — NOT the driver
contract; ``bench.py`` stays the frozen measurement entrypoint.

Usage: python bench_extra.py [--sf-dir D] [--repeats N] [query ...]

Times each named ``__spark_entry__.queries()`` entry with the noop sink
(construction + execution, exactly the frozen bench's timed unit),
labels jobs for the UI, and prints one JSON line with per-query medians
and minima.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from lmss_entity_extractor_spark.session import get_spark

    spark = get_spark(app_name="lmss-bench-extra")
    spark.range(1).count()
    qmap = entry.queries()
    med, mins, samples = {}, {}, {}
    for name in args.queries:
        times = []
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [extra r{r}]")
            t0 = time.time()
            qmap[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med[name] = sorted(times)[(len(times) - 1) // 2]
        mins[name] = min(times)
        samples[name] = times
    print(json.dumps({"sf_dir": args.sf_dir, "queries": med, "queries_min": mins,
                      "samples": samples, "repeats": args.repeats}))
    spark.stop()


if __name__ == "__main__":
    main()
