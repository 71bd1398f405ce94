"""Iceberg-or-parquet table IO (north_rule: "over Iceberg tables").

The production design point is Iceberg: snapshot-isolated writes,
partition evolution on the cell prefix, and scan planning that prunes by
partition + column stats. This sandbox has no Iceberg runtime jar, so the
module degrades transparently to partitioned parquet — same reader/writer
API, same partition column layout — and reports which backend is active.
Everything the engine relies on from the table format (partition pruning
on the cell-prefix column, predicate pushdown, column pruning) is
identical in both backends; Iceberg adds transactional commits and
time-travel, which the lineage checkpoint table (lineage.py) substitutes
for in the parquet fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_CATALOG = "geotile"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog can be instantiated (runtime jar
    on the classpath). Import-try gated — never raises."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def iceberg_session_conf(warehouse: str) -> dict[str, str]:
    """The extra_conf to pass to session.get_spark when the Iceberg jar is
    present (spark-submit --packages org.apache.iceberg:iceberg-spark-runtime)."""
    return {
        f"spark.sql.catalog.{ICEBERG_CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{ICEBERG_CATALOG}.type": "hadoop",
        f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse": warehouse,
    }


def write_pages_table(
    df: DataFrame,
    target: str,
    spark: SparkSession | None = None,
    partition_col: str = "cell_prefix",
    cell_col_name: str = "cell_r7",
    prefix_res: int = 4,
    mode: str = "overwrite",
) -> str:
    """Write a geoparsed table partitioned by the cell prefix.

    The partition column is the cell id coarsened to ``prefix_res`` —
    coarse enough that partition counts stay bounded (4^res-ish over the
    covered area), fine enough that a polygon-region query prunes most of
    the table. Returns the backend used ('iceberg' or 'parquet').
    """
    from socialmapper_spark.geo.cells import cell_to_parent_col

    out = df.withColumn(
        partition_col,
        cell_to_parent_col(F.col(cell_col_name), 7, prefix_res),
    )
    spark = spark or df.sparkSession
    if target.startswith("iceberg:"):
        ident = target[len("iceberg:"):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg target requested but no Iceberg runtime jar on the "
                "classpath; pass --packages org.apache.iceberg:iceberg-spark-runtime"
            )
        (
            out.writeTo(f"{ICEBERG_CATALOG}.{ident}")
            .partitionedBy(F.col(partition_col))
            .createOrReplace()
        )
        return "iceberg"
    out.write.mode(mode).partitionBy(partition_col).parquet(target)
    return "parquet"


def read_pages_table(spark: SparkSession, target: str) -> DataFrame:
    """Read back a table written by :func:`write_pages_table`; partition
    pruning on the prefix column works identically in both backends."""
    if target.startswith("iceberg:"):
        return spark.read.table(f"{ICEBERG_CATALOG}.{target[len('iceberg:'):]}")
    return spark.read.parquet(target)
