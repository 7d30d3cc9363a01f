"""Build a K-times scaled copy of an sf dir for scale-holding tests.

The driver's round-end measurement may use a larger, driver-generated
scale factor than the committed sf0.1, so optimization rounds need
evidence that the query plans hold beyond 600k-row tables.  This script
replicates every fact table K times with disjoint key spaces (dimension
tables region/nation stay fixed), perturbing free-text and embedding
payloads per copy so text/dedup/ANN operators see near-dup — not
byte-identical — replicas:

  * id/key columns get +i*OFFSET per copy i (joins stay consistent,
    graph node encodings key*2(+1) stay well inside int64),
  * documents.text gets a short per-copy prefix (near-dup across copies:
    stresses the LSH/Jaccard candidate caps instead of bypassing them),
    n_chars is recomputed,
  * embeddings are scaled by (1 + i*1e-5) in float32 (kills exact ties,
    keeps the cell structure).

The output is plain parquet, one file per table, readable by both the
Spark entry queries and the DuckDB oracles, so scripts/check_oracle.py
runs unchanged against it:

  python scripts/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf_big 10
  python scripts/check_oracle.py /tmp/sf_big
  SPARK_GRAFT_SF_DIR=/tmp/sf_big SPARK_GRAFT_SCALING=0 python bench.py

Deterministic: pure column arithmetic on the (deterministic) source dir.
"""

from __future__ import annotations

import os
import sys

OFFSET = 1_000_000_000

# key columns to shift per copy (everything else is carried verbatim)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def copy_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    keyed = set(KEYED[table])
    parts = []
    for name, _dtype in cols:
        if name in keyed:
            parts.append(f"({name} + {i * OFFSET}) AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            parts.append(f"('c{i} ' || text) AS text")
        elif table == "documents" and name == "n_chars" and i > 0:
            parts.append(f"CAST(length('c{i} ' || text) AS BIGINT) AS n_chars")
        elif table == "embeddings" and name == "embedding" and i > 0:
            parts.append(
                f"list_transform(embedding, x -> CAST(x * (1 + {i}*1e-5) "
                f"AS FLOAT)) AS embedding"
            )
        else:
            parts.append(name)
    return "SELECT " + ", ".join(parts)


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit("usage: make_scaled_sf.py SRC_DIR DST_DIR K")
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)

    import duckdb

    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied")
    for t in KEYED:
        cols = [
            (r[0], r[1])
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        legs = [
            f"{copy_select(t, cols, i)} FROM '{src}/{t}.parquet'"
            for i in range(k)
        ]
        union = " UNION ALL ".join(legs)
        con.sql(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"  {t}: {n} rows ({k} copies)")


if __name__ == "__main__":
    main()
