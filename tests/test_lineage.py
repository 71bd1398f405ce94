"""Lineage emission + checkpoint resume (SURVEY.md §7.1 M5)."""

import pathlib

import pytest
from pyspark.sql import functions as F

from socialmapper_spark.lineage import (
    completed_buckets,
    run_stage_with_lineage,
    verify_lineage,
    with_bucket,
)


@pytest.fixture()
def workdir(tmp_path):
    return tmp_path


def _source(spark):
    from socialmapper_spark.pipeline import geoparse_pages
    from socialmapper_spark.fixtures import geo_dir_for

    geo = geo_dir_for("sf0.001")
    pages = spark.read.parquet(f"{geo}/pages.parquet")
    return geoparse_pages(pages).filter(F.col("lat").isNotNull()).select(
        "url", "lat", "lon", "cell_r7"
    )


def test_full_run_then_resume_is_noop(spark, workdir):
    df = _source(spark)
    out = str(workdir / "out")
    lin = str(workdir / "lineage")
    n1 = run_stage_with_lineage(
        spark, df, "geoparse", "url", ["url", "cell_r7"], out, lin,
        n_buckets=8, cell_col="cell_r7",
    )
    assert n1 == 8
    assert verify_lineage(spark, out, lin, "geoparse", ["url", "cell_r7"], "cell_r7")
    # rerun: everything committed → zero buckets processed
    n2 = run_stage_with_lineage(
        spark, df, "geoparse", "url", ["url", "cell_r7"], out, lin,
        n_buckets=8, cell_col="cell_r7",
    )
    assert n2 == 0


def test_partial_failure_resume_produces_identical_result(spark, workdir):
    df = _source(spark)
    out_a = str(workdir / "out_a")
    lin_a = str(workdir / "lin_a")
    # simulate a crash after 3 of 8 buckets: run with only buckets 0-2's data
    part = with_bucket(df, "url", 8).filter(F.col("bucket") < 3).drop("bucket")
    run_stage_with_lineage(
        spark, part, "stage1", "url", ["url"], out_a, lin_a, n_buckets=8
    )
    done = {r["bucket"] for r in completed_buckets(spark, lin_a, "stage1").collect()}
    assert done == {0, 1, 2}
    # resume with the full input: only the remaining 5 buckets run
    n = run_stage_with_lineage(
        spark, df, "stage1", "url", ["url"], out_a, lin_a, n_buckets=8
    )
    assert n == 5

    # clean single-shot run for comparison
    out_b = str(workdir / "out_b")
    lin_b = str(workdir / "lin_b")
    run_stage_with_lineage(
        spark, df, "stage1", "url", ["url"], out_b, lin_b, n_buckets=8
    )
    a = sorted(r["url"] for r in spark.read.parquet(out_a).collect())
    b = sorted(r["url"] for r in spark.read.parquet(out_b).collect())
    assert a == b
    # checksums identical across the two runs (kill/rerun idempotence)
    la = {
        (r["bucket"], r["row_count"], r["checksum"])
        for r in spark.read.parquet(lin_a).collect()
    }
    lb = {
        (r["bucket"], r["row_count"], r["checksum"])
        for r in spark.read.parquet(lin_b).collect()
    }
    assert la == lb


def test_checksum_partition_invariance(spark, workdir):
    """Same logical content → same checksums at any parallelism."""
    from socialmapper_spark.lineage import bucket_stats

    df = _source(spark)
    a = bucket_stats(
        with_bucket(df.repartition(3), "url", 4), "s", ["url"], "cell_r7"
    )
    b = bucket_stats(
        with_bucket(df.repartition(23), "url", 4), "s", ["url"], "cell_r7"
    )
    ka = {(r["bucket"], r["row_count"], r["checksum"], r["cell_min"], r["cell_max"])
          for r in a.collect()}
    kb = {(r["bucket"], r["row_count"], r["checksum"], r["cell_min"], r["cell_max"])
          for r in b.collect()}
    assert ka == kb


def test_chunked_commit_resume_skips_committed_buckets(spark, tmp_path):
    """r5: chunked commit granularity — a crash after k committed chunks
    loses only the in-flight chunk; the rerun recomputes exactly the
    never-committed buckets (lineage anti-join), and verify passes."""
    import pytest

    from socialmapper_spark.lineage import run_stage_with_lineage, verify_lineage

    df = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("url"), (F.col("id") % 7).alias("poly_id")
    )
    out, lin = str(tmp_path / "out"), str(tmp_path / "lin")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_stage_with_lineage(
            spark, df, "assign", "url", ["url", "poly_id"], out, lin,
            n_buckets=16, chunk_size=4, fail_after_chunks=2,
        )
    import duckdb

    committed = duckdb.sql(
        f"select count(distinct bucket) from read_parquet('{lin}/*.parquet') "
        f"where status='committed'"
    ).fetchone()[0]
    assert committed == 8
    n = run_stage_with_lineage(
        spark, df, "assign", "url", ["url", "poly_id"], out, lin,
        n_buckets=16, chunk_size=4,
    )
    assert n == 8  # only the never-committed half recomputed
    assert verify_lineage(spark, out, lin, "assign", ["url", "poly_id"])
    # the checkpointed table is complete and exact
    assert spark.read.parquet(out).count() == 2000
