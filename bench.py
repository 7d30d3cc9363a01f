"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus the KG-pipeline throughput +
two-parallelism scaling probe (local[8] vs local[32] — the sandbox stand-in
for the north rule's N vs 4N executors).

Prints ONE JSON line:
{"metric": ..., "value": <total headline sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "kg": {...}, "scaling": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for headline queries (default 32)
  SPARK_GRAFT_SCALING  "0" to skip the two-parallelism probe (default on)
  SPARK_GRAFT_KG_SCALE fixture-corpus multiplier for the KG probe (default 30)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top3_orders_per_customer",
    "revenue_per_region",
    "hourly_event_windows",
    "top20_tokens",
    "dedup_exact_groups",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash",
    "cosine_topk_bruteforce",
    "ann_ivf_topk",
    "multimodal_decode_meta",
]


def run_headline(sf_dir: str, cores: int) -> dict[str, float]:
    from iyp_spark.entry_queries import QUERIES
    from iyp_spark.session import get_spark

    spark = get_spark("bench", cores=cores, shuffle_partitions=max(cores, 8))
    # warm up the JVM (session init, codegen, parquet footer cache)
    spark.range(1000).count()
    timings = {}
    for name in HEADLINE:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    spark.stop()
    return timings


def run_scaling(kg_scale: float) -> dict:
    """Generate one corpus, run the identical pipeline at 8 and 32 cores in
    fresh JVM subprocesses, report docs/sec + efficiency (ratio over 4x)."""
    from iyp_spark.fixtures import all_docs, docs_to_rows
    from iyp_spark.schema import DOCUMENTS_SCHEMA
    from iyp_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="bench_kg_")
    corpus = os.path.join(tmp, "corpus")
    spark = get_spark("bench_gen", cores=8)
    docs = all_docs(kg_scale)
    spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("crawler").parquet(corpus)
    spark.stop()

    out = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, "-m", "iyp_spark.bench_scaling",
             "--cores", str(cores), "--corpus", corpus,
             "--lake", os.path.join(tmp, f"lake{cores}")],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"scaling run at {cores} cores failed")
        out[cores] = json.loads(line[-1])
        print(f"  scaling local[{cores}]: {out[cores]}", file=sys.stderr)
    eff = (out[32]["docs_per_sec"] / out[8]["docs_per_sec"]) / 4.0
    return {
        "local8_docs_per_sec": out[8]["docs_per_sec"],
        "local32_docs_per_sec": out[32]["docs_per_sec"],
        "local8_seconds": out[8]["seconds"],
        "local32_seconds": out[32]["seconds"],
        "docs": out[8]["docs"],
        "triples": out[8]["triples"],
        "efficiency_8_to_32": round(eff, 3),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    timings = run_headline(sf_dir, cores)
    total = round(sum(timings.values()), 3)

    result = {
        "metric": "headline query wall time (sum) + KG pipeline scaling",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        kg_scale = float(os.environ.get("SPARK_GRAFT_KG_SCALE", "30"))
        scaling = run_scaling(kg_scale)
        result["kg"] = {
            "docs": scaling["docs"],
            "triples": scaling["triples"],
            "docs_per_sec_local32": scaling["local32_docs_per_sec"],
        }
        result["scaling"] = scaling
        _write_bench_md(result)

    print(json.dumps(result))


def _write_bench_md(result: dict) -> None:
    s = result.get("scaling", {})
    lines = [
        "# BENCH — measured locally by bench.py",
        "",
        f"Headline queries (sf={result['sf']}, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]): "
        f"**{result['value']}s total**",
        "",
        "| query | sec |", "|---|---|",
    ]
    lines += [f"| {k} | {v} |" for k, v in result["queries"].items()]
    lines += [
        "",
        "## KG pipeline scaling (north rule: N vs 4N parallelism)",
        "",
        "Identical job (4-crawler parse→link→materialize, batched) on an",
        f"identical corpus of {s.get('docs')} documents, fresh JVM per run:",
        "",
        "| parallelism | wall (s) | docs/sec |", "|---|---|---|",
        f"| local[8] | {s.get('local8_seconds')} | {s.get('local8_docs_per_sec')} |",
        f"| local[32] | {s.get('local32_seconds')} | {s.get('local32_docs_per_sec')} |",
        "",
        f"**Scaling efficiency 8→32 cores: {s.get('efficiency_8_to_32')}** "
        "(speedup / 4).",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
