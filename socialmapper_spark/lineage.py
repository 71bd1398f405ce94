"""Per-partition lineage + checkpoint resume (SURVEY.md §4 O14, north_rule).

Absent in the reference (single machine, SQLite caches —
/root/reference/socialmapper/isochrone/cache.py is the closest analog);
required here: every stage emits per-bucket lineage rows
(stage, bucket, cell_min, cell_max, row_count, checksum, status) to a
checkpoint table, and a restarted job anti-joins committed buckets so
failed stages resume without recompute.

Buckets are deterministic functions of the data (``pmod(xxhash64(key),
n_buckets)`` or a cell prefix), NOT Spark partition ids — task placement
may change between runs; bucket membership may not. Checksums are
XOR-aggregated xxhash64 over the output row key columns: order- and
partitioning-insensitive, overflow-free, so identical logical content
yields identical checksums at any parallelism (the salt-invariance the
pytest suite pins).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, bucket int, cell_min long, cell_max long, "
    "row_count long, checksum long, status string, committed_at double"
)


def with_bucket(
    df: DataFrame, key_col: str, n_buckets: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Deterministic bucket id from a key column (content-addressed).

    ``hash_fn``: "xxhash64" (default — fastest, pure JVM) or "md5" (the
    repo's cross-engine 60-bit md5 primitive, dedup.py — bit-reproducible
    in DuckDB/Python, so the whole lineage row becomes SQL-oracle-able;
    md5-60 is non-negative so plain modulo matches across engines)."""
    if hash_fn == "md5":
        from socialmapper_spark.operators.dedup import _md5_hash60

        h = _md5_hash60(0, F.col(key_col).cast("string"))
    else:
        h = F.xxhash64(F.col(key_col))
    return df.withColumn("bucket", F.pmod(h, F.lit(n_buckets)).cast("int"))


def bucket_stats(
    df: DataFrame,
    stage: str,
    checksum_cols: list[str],
    cell_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-bucket lineage rows for a bucketed DataFrame.

    With ``hash_fn="md5"`` the row checksum is the XOR fold of the md5-60
    hash of the checksum columns joined by chr(31) — reproducible in
    DuckDB (``bit_xor(cast(('0x' || substr(md5(...),1,15)) as bigint))``),
    which is what gives ``lineage_stats`` a full SQL oracle. Checksum
    columns must be non-null for the md5 path (concat_ws skips nulls in
    Spark but || propagates them in DuckDB)."""
    cell_min = F.min(cell_col) if cell_col else F.max(F.lit(None).cast("long"))
    cell_max = F.max(cell_col) if cell_col else F.max(F.lit(None).cast("long"))
    if hash_fn == "md5":
        from socialmapper_spark.operators.dedup import _md5_hash60

        cs = _md5_hash60(
            0, F.concat_ws("\x1f", *[F.col(c).cast("string") for c in checksum_cols])
        )
        df = df.withColumn("__cs", cs)
        checksum = F.expr("bit_xor(__cs)")
    else:
        checksum = F.expr("bit_xor(xxhash64(" + ", ".join(checksum_cols) + "))")
    agg = df.groupBy("bucket").agg(
        cell_min.alias("cell_min"),
        cell_max.alias("cell_max"),
        F.count("*").alias("row_count"),
        checksum.alias("checksum"),
    )
    # literal columns added OUTSIDE the aggregate (literal aliases inside
    # agg() trip a Catalyst binding bug under exceptAll in Spark 4.1)
    return agg.select(
        F.lit(stage).alias("stage"),
        "bucket", "cell_min", "cell_max", "row_count", "checksum",
        F.lit("committed").alias("status"),
        F.lit(time.time()).alias("committed_at"),
    )


def completed_buckets(spark: SparkSession, lineage_path: str, stage: str) -> DataFrame:
    """Buckets already committed for this stage (empty frame if no table)."""
    if os.path.exists(lineage_path):
        lin = spark.read.parquet(lineage_path)
        return (
            lin.filter((F.col("stage") == stage) & (F.col("status") == "committed"))
            .select("bucket")
            .distinct()
        )
    return spark.createDataFrame([], "bucket int")


def run_stage_with_lineage(
    spark: SparkSession,
    df: DataFrame,
    stage: str,
    key_col: str,
    checksum_cols: list[str],
    out_path: str,
    lineage_path: str,
    n_buckets: int = 32,
    cell_col: str | None = None,
    chunk_size: int | None = None,
    fail_after_chunks: int | None = None,
) -> int:
    """Execute a stage resumably.

    1. bucket the output by ``key_col``
    2. anti-join buckets already committed in the lineage table
    3. write the remaining buckets (parquet, partitioned by bucket —
       a crashed write leaves partial bucket dirs that are simply
       overwritten on retry because commit happens per bucket AFTER
       the data lands)
    4. append per-bucket lineage rows

    ``chunk_size`` sets the COMMIT GRANULARITY: with it, pending buckets
    land and their lineage rows commit in chunks of that many buckets,
    so a mid-job crash loses at most one in-flight chunk instead of the
    whole stage — the recompute window a 1000-executor job wants bounded.
    The bucketed frame is persisted for the chunk loop (one upstream
    pass, each chunk reads the cache) and released before returning.
    ``fail_after_chunks`` is the failure-injection hook for resume
    drills/tests: raises after that many chunks have committed.

    Returns the number of buckets processed this run (0 = fully resumed).
    """
    bucketed = with_bucket(df, key_col, n_buckets)
    done = completed_buckets(spark, lineage_path, stage)
    todo = bucketed.join(done, "bucket", "left_anti")
    if chunk_size:
        todo = todo.persist()

    try:
        # short-circuit: nothing to do
        pending = todo.select("bucket").distinct().collect()
        if not pending:
            return 0

        pending_ids = sorted(r["bucket"] for r in pending)
        step = chunk_size or len(pending_ids)
        chunks = [
            pending_ids[i : i + step] for i in range(0, len(pending_ids), step)
        ]
        for ci, chunk in enumerate(chunks):
            if fail_after_chunks is not None and ci >= fail_after_chunks:
                raise RuntimeError(
                    f"injected failure after {ci} committed chunks "
                    f"({ci * step} buckets)"
                )
            part = todo.filter(F.col("bucket").isin(chunk))
            (
                part.write.mode("overwrite")
                .partitionBy("bucket")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(out_path)
            )
            # recompute stats from the data as written (what landed is
            # what is certified, not what we intended to write)
            written = spark.read.parquet(out_path).filter(
                F.col("bucket").isin(chunk)
            )
            stats = bucket_stats(written, stage, checksum_cols, cell_col)
            stats.write.mode("append").parquet(lineage_path)
        return len(pending_ids)
    finally:
        if chunk_size:
            todo.unpersist()


def verify_lineage(
    spark: SparkSession, out_path: str, lineage_path: str, stage: str,
    checksum_cols: list[str], cell_col: str | None = None,
) -> bool:
    """Recompute checksums from the output table and compare to lineage."""
    data = spark.read.parquet(out_path)
    fresh = bucket_stats(data, stage, checksum_cols, cell_col).select(
        "bucket", "row_count", "checksum"
    )
    recorded = (
        spark.read.parquet(lineage_path)
        .filter((F.col("stage") == stage) & (F.col("status") == "committed"))
        .select("bucket", "row_count", "checksum")
        .dropDuplicates(["bucket"])
    )
    # lineage tables are tiny (one row per bucket); compare driver-side —
    # also sidesteps a Spark 4.1 exceptAll-over-aggregate binding bug
    fa = {(r["bucket"], r["row_count"], r["checksum"]) for r in fresh.collect()}
    fb = {(r["bucket"], r["row_count"], r["checksum"]) for r in recorded.collect()}
    return fa == fb
