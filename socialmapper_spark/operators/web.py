"""Crawl-table operators over the input_hint page shape
(url, warc_ts, html, text, lang): snapshot dedup + host rollups.

The reference has no crawl-table analog (its nearest dedup is the
census-unit groupBy, reference socialmapper/census/utils.py); these are
training-data-pipeline operators the build mandate adds on top, shaped
for a Common-Crawl-style table where every url appears once per crawl
snapshot and host-level statistics drive source filtering.

Scale design: both operators are SINGLE-shuffle hash aggregations keyed
on high-cardinality, low-skew columns (url; host). snapshot_dedup uses
the struct-max groupBy form instead of a row_number window on purpose:
max() partial-aggregates map-side, so each input split reduces its local
snapshots before the exchange — at 10^12 rows with ~3 snapshots/url the
shuffle carries roughly one row per (url, split) instead of every
snapshot, and no per-key sort is ever materialized. Everything is pure
Catalyst (no Python on executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# URI authority minus userinfo and port: the char class excludes the
# '@' userinfo terminator, the ':' port separator, and path/query/frag
# starters. RE2-safe (non-capturing group) so the same pattern runs
# verbatim in DuckDB's regexp_extract for the oracle twin.
HOST_RE = "://(?:[^/@?#]*@)?([^/:?#]+)"


def page_host(url: Column) -> Column:
    """Host (registrable authority, sans userinfo/port) of a url column."""
    return F.regexp_extract(url, HOST_RE, 1)


def snapshot_dedup(pages: DataFrame) -> DataFrame:
    """Latest-crawl-wins dedup: one row per url — the snapshot with the
    max warc_ts — plus the url's total snapshot count.

    Ordering is (warc_ts, md5(text)): the fingerprint breaks exact
    timestamp ties deterministically, so the result is a pure function
    of the table content at any parallelism. Emits the timestamp as
    epoch micros (bigint) to keep the cross-engine value hash free of
    timestamp-representation differences (events.py convention).
    """
    top = F.max(
        F.struct(
            F.unix_micros(F.col("warc_ts")).alias("ts_us"),
            F.md5(F.col("text")).alias("tb"),
            F.col("lang").alias("lang"),
            F.col("text").alias("text"),
        )
    ).alias("top")
    agg = pages.groupBy("url").agg(top, F.count("*").alias("n_snapshots"))
    return agg.select(
        "url",
        F.col("top.ts_us").alias("warc_ts_us"),
        F.col("top.lang").alias("lang"),
        F.col("top.text").alias("text"),
        "n_snapshots",
    )


def host_stats(pages: DataFrame) -> DataFrame:
    """Per-host crawl rollup: page rows, distinct urls, latest crawl
    timestamp, and English share.

    countDistinct(url) is Spark's exact two-phase distinct aggregate
    (partial distinct map-side, no extra job). en_share averages 0/1
    indicators — integer-valued double sums are exact, so the 6-dp
    rounding is stable across engines and partitionings.
    """
    return pages.groupBy(page_host(F.col("url")).alias("host")).agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("url").alias("n_urls"),
        F.max(F.unix_micros(F.col("warc_ts"))).alias("latest_ts_us"),
        F.round(F.avg((F.col("lang") == "en").cast("double")), 6).alias("en_share"),
    )
