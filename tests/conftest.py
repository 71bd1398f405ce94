import pytest


@pytest.fixture(scope="session")
def spark():
    from socialmapper_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def geo_small():
    """Small-scale geospatial fixture dir (generated on demand, seed 42)."""
    from socialmapper_spark.fixtures import geo_dir_for

    return str(geo_dir_for("sf0.001"))
