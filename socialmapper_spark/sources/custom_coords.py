"""S3 — schema-tolerant custom coordinates reader (JSON/CSV → POI rows).

Reference semantics (/root/reference/socialmapper/pipeline/extraction.py:24-202):

- latitude from the first present of ``lat | latitude | y``; longitude
  from ``lon | lng | longitude | x`` (JSON ``:76-87``, CSV ``:126-140``)
- rows missing either coordinate are dropped (``:68-74, :130-140``)
- ``name`` defaults to ``"Custom POI {i}"`` (0-based row index), ``type``
  defaults to ``"custom"`` (``:98-105, :154-161``)
- every column that is not a recognized coordinate/name/type/id column is
  preserved into the ``tags`` map (``:106-112, :162-168``)

Spark-first translation: ``coalesce()`` over the candidate columns,
``monotonically_increasing_id`` is NOT used for the default name (it is
partition-dependent) — a deterministic dense index from a window over the
file order would serialize the scan, so the default name instead derives
from a row-content hash, documented and pinned by tests. ``tags`` is a
``map<string,string>`` built with ``map_from_arrays``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAT_CANDIDATES = ["lat", "latitude", "y"]
LON_CANDIDATES = ["lon", "lng", "longitude", "x"]
RESERVED = set(LAT_CANDIDATES + LON_CANDIDATES + ["id", "name", "type", "state"])


def normalize_poi_frame(df: DataFrame) -> DataFrame:
    """Apply the tolerant-schema POI normalization to an already-loaded frame."""
    cols = df.columns
    lat_cols = [c for c in LAT_CANDIDATES if c in cols]
    lon_cols = [c for c in LON_CANDIDATES if c in cols]
    if not lat_cols or not lon_cols:
        raise ValueError(
            f"no coordinate column found; need one of {LAT_CANDIDATES} and {LON_CANDIDATES}"
        )
    lat = F.coalesce(*[F.col(c).cast("double") for c in lat_cols])
    lon = F.coalesce(*[F.col(c).cast("double") for c in lon_cols])

    extra = [c for c in cols if c not in RESERVED]
    tags = F.map_from_arrays(
        F.array(*[F.lit(c) for c in extra]),
        F.array(*[F.col(c).cast("string") for c in extra]),
    ) if extra else F.create_map().cast("map<string,string>")

    # deterministic id: the file's own id column, else a content hash
    # (monotonically_increasing_id is partition-dependent — never used).
    id_expr = (
        F.col("id").cast("string")
        if "id" in cols
        else F.concat(F.lit("custom_"), F.md5(F.concat_ws("\x1f", *cols)))
    )
    # default name: reference uses the row index ("Custom POI {i}",
    # extraction.py:98-105); a distributed scan has no stable row index, so
    # the default derives from the row id instead (documented divergence).
    default_name = F.concat(F.lit("Custom POI "), id_expr)
    out = df.select(
        id_expr.alias("id"),
        (
            F.coalesce(F.col("name").cast("string"), default_name)
            if "name" in cols
            else default_name
        ).alias("name"),
        (
            F.coalesce(F.col("type").cast("string"), F.lit("custom"))
            if "type" in cols
            else F.lit("custom")
        ).alias("type"),
        lat.alias("lat"),
        lon.alias("lon"),
        tags.alias("tags"),
    )
    # required-field predicate (P2): drop rows missing either coordinate
    return out.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())


def read_custom_coordinates(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON / CSV / parquet coordinates file into the POI schema
    ``(id, name, type, lat, lon, tags:map<string,string>)``.
    """
    if path.endswith(".json") or path.endswith(".jsonl"):
        raw = spark.read.option("multiLine", "true").json(path)
    elif path.endswith(".csv"):
        raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    elif path.endswith(".parquet"):
        raw = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported extension: {path}")
    return normalize_poi_frame(raw)
