#!/usr/bin/env bash
# Cluster submission recipe (north rule: spark-submit --py-files on a
# multi-executor cluster). The engine is a plain Python package — zip it
# and ship it; the job script below is the batched weekly build.
#
# The same job at two cluster sizes (N and 4N executors) is the scaling
# check bench.py evidences locally with pinned local[2]/local[8] JVMs.
set -euo pipefail

LAKE=${LAKE:?s3a://... lake root (local backend) or catalog.db prefix (iceberg)}
EXECUTORS=${EXECUTORS:-250}
# Store backend: "iceberg" routes GraphStore through store_iceberg
# (MERGE INTO / overwritePartitions, multi-writer-safe commits); "local"
# keeps the partitioned-parquet stand-in. run_build.py reads this env.
STORE_BACKEND=${STORE_BACKEND:-iceberg}
CATALOG=${CATALOG:-lake}
WAREHOUSE=${WAREHOUSE:-$LAKE}

cd "$(dirname "$0")/.."
zip -qr /tmp/iyp_spark.zip iyp_spark

spark-submit \
  --deploy-mode cluster \
  --num-executors "$EXECUTORS" \
  --executor-cores 4 \
  --executor-memory 16g \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --conf spark.sql.files.maxPartitionBytes=256m \
  --conf spark.sql.parquet.compression.codec=zstd \
  --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
  --conf spark.sql.catalog."$CATALOG"=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog."$CATALOG".type=glue \
  --conf spark.sql.catalog."$CATALOG".warehouse="$WAREHOUSE" \
  --conf spark.executorEnv.IYP_STORE_BACKEND="$STORE_BACKEND" \
  --conf spark.yarn.appMasterEnv.IYP_STORE_BACKEND="$STORE_BACKEND" \
  --py-files /tmp/iyp_spark.zip \
  scripts/run_build.py --lake "$LAKE" --mode batched
