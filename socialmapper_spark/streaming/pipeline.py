"""Streaming twin of the page-assignment pipeline.

The batch flagship path (pipeline.py) is geoparse → cell encode →
two-phase PIP — all *stateless* narrow ops plus broadcast joins, which
is exactly the shape Structured Streaming runs unchanged: a pages
``readStream`` flows through the same column expressions and the same
broadcast polygon index, emitting assignment rows in append mode with
no state store and no watermark needed. This is the production
continuous-ingest form of the engine (new WARC drops land in the pages
table; assignments append incrementally); the batch plan stays the
backfill/oracle twin — Spark's unification guarantee, pinned by a test
that drains a multi-file stream and compares to the batch output.

Stateful event-time operators (windows, sessionization) live in
operators/events.py.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from socialmapper_spark.operators.spatial_join import (
    PREFILTER_RES,
    PolygonIndex,
    prepare_polygons,
    spatial_join,
)
from socialmapper_spark.pipeline import geoparse_pages


def page_assignments_readstream(
    spark: SparkSession,
    pages_dir: str,
    polygons: DataFrame,
    file_glob: str = "pages.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded assignment stream: returns a *streaming* DataFrame of
    (url, poly_id, GEOID, kind, cell_r9) ready for ``writeStream``.

    The polygon side is a static (batch) DataFrame — stream-static
    broadcast joins are the supported and scalable shape; the polygon
    index is built once per query, not per micro-batch.
    """
    schema = spark.read.option("pathGlobFilter", file_glob).parquet(pages_dir).schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", file_glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)
    geop = geoparse_pages(pages).filter(F.col("lat").isNotNull())
    index: PolygonIndex = prepare_polygons(spark, polygons, PREFILTER_RES)
    hits = spatial_join(geop, index, cell="cell_r7")
    return hits.join(F.broadcast(index.meta_df), "poly_id").select(
        "url", "poly_id", "GEOID", "kind", "cell_r9"
    )


def page_assignments_stream(
    spark: SparkSession,
    pages_dir: str,
    polygons: DataFrame,
    file_glob: str = "pages.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Finite-drain helper: runs the assignment stream with an
    availableNow trigger into a memory sink and returns the result —
    the testable twin of the batch ``page_assignments``."""
    out = page_assignments_readstream(
        spark, pages_dir, polygons, file_glob, max_files_per_trigger
    )
    sink = f"assign_stream_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
