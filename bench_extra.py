"""Optimization-round measurement harness (guide §1) — NOT the driver
bench. Times each declared query in isolation with the noop sink (so the
computation is measured, not the sink or count()-pruning), labels jobs,
and dumps `.explain("formatted")` plans to plans/r06/.

Usage:
  python bench_extra.py [--plans DIR] [--repeat N] [query ...]

Numbers printed here are the optimization loop's inner metric; the
driver-comparable numbers stay bench.py's (frozen) count() timings.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE  # noqa: E402  (frozen list, read-only)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--plans", default=None, help="dump explain() to DIR")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from iyp_spark.entry_queries import QUERIES, tbl
    from iyp_spark.ops.similarity import cached_ivf_index
    from iyp_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cores,
                      shuffle_partitions=max(cores, 8))
    # warm exactly like bench.py: scheduler/codegen, parquet footers,
    # python worker pool
    spark.range(1000).groupBy(F.col("id") % 4).count().count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            tbl(spark, args.sf_dir, t).limit(1).count()
        except Exception:
            pass

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).count()
    cached_ivf_index(spark, tbl(spark, args.sf_dir, "embeddings"), args.sf_dir)

    names = args.queries or HEADLINE
    out = {}
    for name in names:
        if name not in QUERIES:
            print(f"  !! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans,
                                   f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for r in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} [r{r}]")
            t0 = time.time()
            (QUERIES[name](spark, args.sf_dir)
             .write.format("noop").mode("overwrite").save())
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = min(samples)
        print(f"  {name}: {min(samples)}s  (samples {samples})",
              file=sys.stderr)
    total = round(sum(out.values()), 3)
    print(f"TOTAL (noop, min of {args.repeat}): {total}s over "
          f"{len(out)} queries", file=sys.stderr)
    import json
    print(json.dumps({"noop_queries": out, "total": total}))
    spark.stop()


if __name__ == "__main__":
    main()
