import pytest


@pytest.fixture(scope="session")
def spark():
    import os

    from socialmapper_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 * 1024 * 1024))
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def geo_small():
    """Small-scale geospatial fixture dir (generated on demand, seed 42)."""
    from socialmapper_spark.fixtures import geo_dir_for

    return str(geo_dir_for("sf0.001"))
