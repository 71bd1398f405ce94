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
    """Small-scale geospatial fixture dir (generated on demand, seed 42).

    Ensures the extras goldens too: the goldens-vs-engine tests
    (test_round4_ops zonal/burn/classify) read golden_* files that only
    ensure_geo_extras writes, and a fresh checkout (or a regenerated
    fixture dir) otherwise only has the main `.v*` marker's files."""
    from socialmapper_spark.fixtures import ensure_geo_extras, geo_dir_for

    d = str(geo_dir_for("sf0.001"))
    ensure_geo_extras("sf0.001")
    return d
