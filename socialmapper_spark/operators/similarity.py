"""Similarity search over embedding columns (build mandate: ANN).

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

- :func:`cosine_topk` — exact brute-force top-k per query vector. Query
  vectors are collected driver-side (queries are few), shipped as plan
  literals, and similarity is a pure Catalyst fold
  (``aggregate(zip_with(...))``) — JVM-side, codegen, no UDF. The scan
  side is never shuffled; top-k is a map-side-combinable min(struct) per
  query. This is the parity baseline.
- :func:`lsh_buckets` / :func:`lsh_ann_topk` — the scale path: seeded
  random-hyperplane LSH (sign bits → bucket id) computed by a vectorized
  Arrow UDF; candidates are vectors in the same bucket as the query
  (multi-probe: plus all buckets at Hamming distance 1), then exact
  rerank. Deterministic (fixed seed), so the pytest suite checks recall
  against the exact path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LSH_BITS = 12
LSH_SEED = 42


def _dot_expr(vec_col: F.Column, q: list[float]) -> F.Column:
    """Catalyst dot product of a column vector with a literal query."""
    lit_q = F.array(*[F.lit(float(v)) for v in q])
    return F.aggregate(
        F.zip_with(vec_col, lit_q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(vec_col: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, cosine, rank).

    Self-matches are excluded. cosine is rounded to 9 dp to absorb
    accumulation-order differences vs oracles (well above double noise,
    well below any real similarity gap).
    """
    qrows = {
        r[id_col]: list(r[vec_col])
        for r in embeddings.filter(F.col(id_col).isin(query_ids)).collect()
    }
    per_query = []
    for qid in query_ids:
        q = qrows[qid]
        qn = float(np.sqrt(np.dot(np.array(q, dtype=np.float64), np.array(q, dtype=np.float64))))
        cos = _dot_expr(F.col(vec_col), q) / (_norm_expr(F.col(vec_col)) * F.lit(qn))
        scored = embeddings.filter(F.col(id_col) != qid).select(
            F.lit(qid).alias("query_id"),
            F.col(id_col).alias("vec_id_m"),
            F.round(cos, 9).alias("cosine"),
        )
        per_query.append(scored)
    allq = per_query[0]
    for s in per_query[1:]:
        allq = allq.unionByName(s)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id_m").asc()
    )
    return (
        allq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id_m").alias("vec_id"), "cosine", "rank")
    )


def cosine_topk_many(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: int = 8,
) -> DataFrame:
    """Many-query form of :func:`cosine_topk`: ONE scan, a broadcast
    query matrix, and per-partition top-(k+margin) heaps — plan size is
    O(1) in the number of queries (the literal-per-query form unions one
    scan branch per query, fine at 5, wrong at 5 000).

    Bit-parity with :func:`cosine_topk`: the Arrow kernel accumulates
    dot/norm dimension-sequentially (the exact fold order of the Catalyst
    ``aggregate`` expression) and applies the same HALF_UP 9 dp rounding,
    so emitted cosines are identical; only a >``margin``-way tie inside
    5e-10 at the k boundary could reorder the cut (documented, unpinned
    — random embeddings never get there).

    Scale shape: scan → narrow mapInPandas (no shuffle) → shuffle of
    ≤ partitions·|Q|·(k+margin) candidate rows → per-query window.
    """
    from decimal import ROUND_HALF_UP, Decimal

    qrows = {
        r[id_col]: np.array(list(r[vec_col]), dtype=np.float64)
        for r in embeddings.filter(F.col(id_col).isin(query_ids)).collect()
    }
    missing = [qid for qid in query_ids if qid not in qrows]
    if missing:
        raise ValueError(f"query ids not found in {id_col}: {missing}")
    qmat = np.stack([qrows[qid] for qid in query_ids])  # (Q, D)
    # np.dot per query — the exact qn arithmetic of cosine_topk/the golden
    qns = np.array(
        [float(np.sqrt(np.dot(qrows[qid], qrows[qid]))) for qid in query_ids]
    )
    qids = list(query_ids)
    bc = spark.sparkContext.broadcast((qids, qmat, qns))
    keep = k + margin
    q9 = Decimal("0.000000001")

    def gen(batches):
        b_qids, b_qmat, b_qns = bc.value
        nq, dim = b_qmat.shape
        # per-query candidate pools for this partition
        pool_cos: list[list[float]] = [[] for _ in range(nq)]
        pool_ids: list[list[int]] = [[] for _ in range(nq)]
        for pdf in batches:
            if len(pdf) == 0:  # empty partitions yield empty batches
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # dimension-sequential accumulation == the Catalyst fold order
            acc = np.zeros((mat.shape[0], nq))
            nrm = np.zeros(mat.shape[0])
            for d in range(dim):
                acc += mat[:, d : d + 1] * b_qmat[None, :, d][0]
                nrm += mat[:, d] * mat[:, d]
            cos = acc / (np.sqrt(nrm)[:, None] * b_qns[None, :])
            for j, qid in enumerate(b_qids):
                cj = cos[:, j]
                mask = ids != qid
                cj, idj = cj[mask], ids[mask]
                if len(cj) > keep:
                    # lexsort keeps the (cosine desc, vec_id asc) boundary
                    # tie-break identical to the final window's ordering
                    part = np.lexsort((idj, -cj))[:keep]
                    cj, idj = cj[part], idj[part]
                pool_cos[j].extend(cj.tolist())
                pool_ids[j].extend(int(v) for v in idj)
        rows = []
        for j, qid in enumerate(b_qids):
            cj = np.array(pool_cos[j])
            idj = np.array(pool_ids[j])
            if len(cj) == 0:
                continue
            order = np.lexsort((idj, -cj))[:keep]
            for i in order:
                # same rounding as Spark's round(col, 9): BigDecimal on the
                # shortest double repr, HALF_UP — only on survivors (cheap)
                c = float(
                    Decimal(repr(float(cj[i]))).quantize(q9, ROUND_HALF_UP)
                )
                rows.append((qid, int(idj[i]), c))
        yield pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])

    cand = embeddings.select(id_col, vec_col).mapInPandas(
        gen, "query_id long, vec_id long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _planes(dim: int, bits: int = LSH_BITS, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket_py(vec: np.ndarray, planes: np.ndarray) -> int:
    signs = planes @ np.asarray(vec, dtype=np.float64) > 0.0
    out = 0
    for i, s in enumerate(signs):
        if s:
            out |= 1 << i
    return out


def lsh_buckets(
    spark: SparkSession,
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
) -> DataFrame:
    """Adds ``bucket`` int column via seeded hyperplane LSH (Arrow UDF)."""
    planes = _planes(dim, bits)
    bc = spark.sparkContext.broadcast(planes)

    @pandas_udf("int")
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim) float32
        signs = mat.astype(np.float64) @ bc.value.T > 0.0  # (batch, bits)
        weights = (1 << np.arange(signs.shape[1])).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    return embeddings.withColumn("bucket", bucket(F.col(vec_col)))


IVF_NLIST = 16
IVF_NPROBE = 4
IVF_SEED = 42
IVF_TRAIN_CAP = 100_000


def train_ivf_centroids(
    vecs: np.ndarray, nlist: int = IVF_NLIST, iters: int = 5, seed: int = IVF_SEED
) -> np.ndarray:
    """Deterministic Lloyd k-means for the IVF coarse quantizer.

    Driver-side prep (like polygon-index prep): trains on a bounded sample
    (the caller caps collection at IVF_TRAIN_CAP), fixed seed, fixed
    iteration count — the centroid matrix is a pure function of the
    training set, shared verbatim by the engine and the oracle twin.
    """
    rng = np.random.default_rng(seed)
    vecs = np.asarray(vecs, dtype=np.float64)
    idx = rng.choice(len(vecs), size=min(nlist, len(vecs)), replace=False)
    cent = vecs[np.sort(idx)].copy()
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(np.round(d2, 6), axis=1)
        for c in range(len(cent)):
            members = vecs[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_assignment_scores(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Rounded squared-distance scores used for cluster assignment by BOTH
    the executor UDF and the oracle twin. Rounding to 6 dp absorbs
    BLAS-blocking last-bit differences so assignment is batch-shape
    independent (ties then resolve to the lowest centroid index)."""
    d2 = (
        (cent**2).sum(axis=1)[None, :]
        - 2.0 * (mat.astype(np.float64) @ cent.T)
        + (mat.astype(np.float64) ** 2).sum(axis=1)[:, None]
    )
    return np.round(d2, 6)


def ivf_ann_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse k-means quantizer partitions the
    corpus into nlist inverted lists; each query exact-reranks only the
    nprobe nearest lists. Output schema matches :func:`cosine_topk`.

    Scale shape: training samples ≤ IVF_TRAIN_CAP rows driver-side (hash
    sample — deterministic under repartitioning); assignment is one
    vectorized Arrow UDF pass (narrow); the probe filter prunes the scan
    to ~nprobe/nlist of the corpus per query before the Catalyst-fold
    rerank. The list id doubles as a partition/bucket key at 100 TB scale
    (write the table clustered by it and probing prunes whole files).
    """
    n = embeddings.count()
    train_df = embeddings.select(id_col, vec_col)
    if n > IVF_TRAIN_CAP:
        # ceiling modulus: keeps the expected sample ≤ IVF_TRAIN_CAP (a
        # floor modulus passes up to 2× the cap — and EVERY row while
        # n < 2×cap, where floor(n/cap) == 1)
        train_df = train_df.filter(
            F.pmod(
                F.xxhash64(F.col(id_col).cast("string")),
                F.lit(-(-n // IVF_TRAIN_CAP)),
            )
            == 0
        )
    train = np.array(
        [list(r[vec_col]) for r in train_df.orderBy(id_col).collect()], dtype=np.float64
    )
    cent = train_ivf_centroids(train, nlist)
    bc = spark.sparkContext.broadcast(cent)

    @pandas_udf("int")
    def list_id(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        scores = ivf_assignment_scores(mat, bc.value)
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    listed = embeddings.withColumn("ivf_list", list_id(F.col(vec_col)))

    qrows = {
        r[id_col]: np.array(list(r[vec_col]), dtype=np.float64)
        for r in embeddings.filter(F.col(id_col).isin(query_ids)).collect()
    }
    missing = [qid for qid in query_ids if qid not in qrows]
    if missing:
        raise ValueError(f"query ids not found in {id_col}: {missing}")
    per_query = []
    for qid in query_ids:
        q = qrows[qid]
        qscores = ivf_assignment_scores(q[None, :], cent)[0]
        probe = [int(c) for c in np.argsort(qscores, kind="stable")[:nprobe]]
        qn = float(np.sqrt(q @ q))
        cos = _dot_expr(F.col(vec_col), [float(x) for x in q]) / (
            _norm_expr(F.col(vec_col)) * F.lit(qn)
        )
        per_query.append(
            listed.filter(F.col("ivf_list").isin(probe))
            .filter(F.col(id_col) != qid)
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("vec_id_m"),
                F.round(cos, 9).alias("cosine"),
            )
        )
    allq = per_query[0]
    for s in per_query[1:]:
        allq = allq.unionByName(s)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id_m").asc()
    )
    return (
        allq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id_m").alias("vec_id"), "cosine", "rank")
    )


NEAR_DUP_BITS = 6
NEAR_DUP_THRESHOLD = 0.35


def _pair_dot_expr(a: F.Column, b: F.Column) -> F.Column:
    """Catalyst dot product of two array columns (sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def embedding_near_dup_pairs(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    bits: int = NEAR_DUP_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (build mandate: embedding
    near-dup dedup): LSH-bucket the corpus with ``bits`` hyperplanes, pair
    vectors within each bucket, keep pairs with exact cosine ≥ threshold.

    Scale shape: the self-join shuffles BOTH sides on the bucket id only —
    a 2^bits-ary partition of the corpus — then the cosine is a pure
    Catalyst fold on the joined rows. Candidate count is Σ n_b² over
    buckets, the standard LSH trade (recall vs quadratic blowup); ``bits``
    tunes it. Deterministic (seeded planes), so the pure-Python twin in
    fixtures reproduces the exact row set.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    bucketed = lsh_buckets(spark, embeddings, dim, id_col, vec_col, bits)
    a = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__emb_a")
    )
    b = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__emb_b")
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = _pair_dot_expr(F.col("__emb_a"), F.col("__emb_b")) / (
        _norm_expr(F.col("__emb_a")) * _norm_expr(F.col("__emb_b"))
    )
    return (
        pairs.withColumn("cosine", F.round(cos, 9))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("vec_a", "vec_b", "cosine")
    )


def lsh_ann_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
) -> DataFrame:
    """Approximate top-k: exact rerank within the query's LSH bucket and
    all buckets at Hamming distance 1 (multi-probe). Output schema matches
    :func:`cosine_topk`; rows may differ (approximation) — recall vs the
    exact path is what tests pin."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, bits)
    bucketed = lsh_buckets(spark, embeddings, dim, id_col, vec_col, bits)

    qrows = {
        r[id_col]: np.array(list(r[vec_col]), dtype=np.float64)
        for r in embeddings.filter(F.col(id_col).isin(query_ids)).collect()
    }
    missing = [qid for qid in query_ids if qid not in qrows]
    if missing:
        raise ValueError(f"query ids not found in {id_col}: {missing}")
    per_query = []
    for qid in query_ids:
        q = qrows[qid]
        qb = lsh_bucket_py(q, planes)
        probe = [qb] + [qb ^ (1 << i) for i in range(bits)]
        qn = float(np.sqrt(q @ q))
        cos = _dot_expr(F.col(vec_col), [float(x) for x in q]) / (
            _norm_expr(F.col(vec_col)) * F.lit(qn)
        )
        scored = (
            bucketed.filter(F.col("bucket").isin(probe))
            .filter(F.col(id_col) != qid)
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("vec_id_m"),
                F.round(cos, 9).alias("cosine"),
            )
        )
        per_query.append(scored)
    allq = per_query[0]
    for s in per_query[1:]:
        allq = allq.unionByName(s)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id_m").asc()
    )
    return (
        allq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id_m").alias("vec_id"), "cosine", "rank")
    )
