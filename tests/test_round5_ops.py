"""Round-5 fixes: quantization NaN/empty-vector domain guard, the
driver-compatible q_str projection, and the star-CC convergence
contract."""

import math

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


# --- int8 quantization: domain guard (r4 ADVICE similarity.py:66) -------------

def test_quantize_nan_and_empty_vectors_null_out(spark):
    """The bit-reproducibility contract only holds for finite non-empty
    vectors; NaN-containing and empty vectors must null out all three
    outputs explicitly (not propagate engine-dependent NaN semantics)."""
    from socialmapper_spark.operators.similarity import quantize_embeddings

    rows = [
        (0, [1.0, float("nan"), 0.5]),
        (1, []),
        (2, [0.5, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for bad in (0, 1):
        r = got[bad]
        assert r["scale"] is None and r["q"] is None and r["max_abs_err"] is None
    ok = got[2]
    assert ok["scale"] == 1.0 and ok["q"] == [64, -127]


def test_quantize_guard_matches_duckdb_twin(spark, tmp_path):
    """The guarded SQL twin nulls the same rows and produces the same
    q_str codes — including a NaN row, an empty row, and normal rows."""
    import duckdb

    from socialmapper_spark.operators.similarity import (
        quantize_embeddings,
        quantize_embeddings_sql,
    )

    rows = [
        (0, [1.0, float("nan"), 0.5]),
        (1, []),
        (2, [0.5, -1.0, 0.123456]),
        (3, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    p = str(tmp_path / "emb.parquet")
    df.write.mode("overwrite").parquet(p)

    out = quantize_embeddings(spark.read.parquet(p)).select(
        "vec_id",
        "scale",
        F.array_join(F.transform("q", lambda x: x.cast("string")), ",").alias(
            "q_str"
        ),
        "max_abs_err",
    )
    got = {r["vec_id"]: (r["scale"], r["q_str"], r["max_abs_err"])
           for r in out.collect()}

    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from read_parquet('{p}/*.parquet')"
    )
    sql = quantize_embeddings_sql("embeddings", codes_as_string=True)
    exp = {}
    for vec_id, scale, q_str, err in con.execute(sql).fetchall():
        exp[vec_id] = (scale, q_str, err)
    assert set(got) == set(exp)
    for k in got:
        gs, gq, ge = got[k]
        es, eq, ee = exp[k]
        assert gq == eq, (k, gq, eq)
        for a, b in ((gs, es), (ge, ee)):
            if a is None or b is None:
                assert a is None and b is None, (k, a, b)
            else:
                assert repr(a) == repr(b), (k, a, b)


def test_registry_quantize_entry_has_no_complex_columns(spark):
    """The r4 driver red row was an array<int> output column the pandas
    canonicalizer cannot hash; pin that the registry projection (and by
    extension the sweep invariant) stays flat-typed."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = em.queries()["embedding_quantize"](spark, SF_SMALL)
    assert df.columns == ["vec_id", "scale", "q_str", "max_abs_err"]
    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), f


# --- CC convergence contracts (r4 ADVICE dedup.py:479) -------------------------

def _chain_pairs(spark, n=12):
    rows = [(i, i + 1) for i in range(n)]
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_star_cc_raises_on_non_convergence(spark):
    """Exiting the star loop via max_iter leaves non-star edges; the
    labeling would emit conflicting (node,label) rows — must raise, not
    silently return duplicate doc_id rows."""
    from socialmapper_spark.operators.dedup import dedup_groups

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_groups(_chain_pairs(spark), method="star", max_iter=1).collect()


def test_hashmin_cc_warns_on_non_convergence(spark):
    """hash-min's max_iter exit keeps one row per node but may split a
    long-chain component; the contract is a RuntimeWarning."""
    from socialmapper_spark.operators.dedup import dedup_groups

    with pytest.warns(RuntimeWarning, match="still changing"):
        out = dedup_groups(_chain_pairs(spark, n=20), max_iter=2).collect()
    # still exactly one row per node even when warned
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) == 21


def test_star_cc_converged_chain_matches_hashmin(spark):
    """With enough rounds both methods agree exactly on a path graph."""
    from socialmapper_spark.operators.dedup import dedup_groups

    a = sorted(
        (r["doc_id"], r["group_id"], r["is_canonical"])
        for r in dedup_groups(_chain_pairs(spark), method="star").collect()
    )
    b = sorted(
        (r["doc_id"], r["group_id"], r["is_canonical"])
        for r in dedup_groups(_chain_pairs(spark), method="hashmin").collect()
    )
    assert a == b and a[0] == (0, 0, True)


# --- exact integer cell/tile decode (r4 ADVICE raster.py:108) ------------------

def test_raster_decode_exact_at_high_res(spark):
    """res ≥ 17 puts the in-resolution remainder past 2^53, where the old
    double-division decode could misfloor; the shiftright/pmod decode must
    be bit-exact against Python integer arithmetic at MAX_RES."""
    from socialmapper_spark.geo.cells import _IX_SHIFT, _R_SHIFT
    from socialmapper_spark.operators.raster import _ix, _iy

    res = 22
    nx = 1 << (res + 7)
    # adversarial indices: max ix, ix patterns ending in all-ones/zeros,
    # plus a dense band near the top of the x range
    ixs = [nx - 1, nx - 2, (1 << 28) - 1, (1 << 28), 123456789, 0, 1]
    iys = [(1 << 28) - 1, 7, 0, 268435455, 99999999, 1, 2]
    rows = [
        (int(res * _R_SHIFT + ix * _IX_SHIFT + iy), ix, iy)
        for ix, iy in zip(ixs, iys)
    ]
    df = spark.createDataFrame(rows, "cell long, ix long, iy long")
    got = df.select(
        "ix", "iy", _ix(F.col("cell")).alias("gx"), _iy(F.col("cell")).alias("gy")
    ).collect()
    for r in got:
        assert r["gx"] == r["ix"] and r["gy"] == r["iy"], dict(r.asDict())
