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


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 max-abs quantization of an embedding column —
    the 4× memory cut a 100-TB ANN index takes before sharding:
    ``q_i = clamp(floor(x_i / scale · 127 + 0.5), −127, 127)`` with
    ``scale = max|x_i|`` per vector. floor(·+0.5) is the rounding rule
    ON PURPOSE: Spark's round() (HALF_UP) and DuckDB's round() disagree
    with each other on some half-way doubles, while floor of the same
    IEEE double is identical everywhere — so the quantized codes are
    bit-reproducible across engines and the oracle can hash them.

    Output: (id, scale double, q array<int>, max_abs_err double) where
    max_abs_err = max_i |x_i − q_i·scale/127| ≤ scale/254 + ulp (the
    round-to-nearest bound; pytest pins it). Pure Catalyst scan-side
    projection — no shuffle, no Python; dequantization is
    ``q_i · scale / 127`` with the same cross-engine exactness.

    Domain of the bit-reproducibility contract (r4 ADVICE): it holds only
    for finite, non-empty vectors. Empty vectors and vectors containing
    NaN are OUTSIDE the domain — Spark and DuckDB disagree on NaN
    ordering inside max and on floor(NaN) — so both are nulled out
    explicitly (scale/q/max_abs_err all NULL) rather than left to
    engine-dependent propagation. The SQL twin applies the same guard.
    """
    vec = F.col(vec_col)
    raw_scale = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    # Guard: empty vector → array_max returns NULL; any NaN element makes
    # raw_scale NaN (NaN sorts greatest in Spark's array_max). Null the
    # scale in both cases so every downstream output nulls with it.
    scale = F.when(F.isnan(raw_scale), F.lit(None).cast("double")).otherwise(
        raw_scale
    )
    d = embeddings.select(id_col, vec_col, scale.alias("scale"))
    qarr = F.transform(
        F.col(vec_col),
        lambda x: F.when(F.col("scale") == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(
                        x.cast("double") / F.col("scale") * F.lit(127.0) + F.lit(0.5)
                    ),
                ),
            )
        )
        .cast("int"),
    )
    d = d.withColumn(
        "q",
        F.when(F.col("scale").isNull(), F.lit(None).cast("array<int>")).otherwise(
            qarr
        ),
    )
    err = F.array_max(
        F.zip_with(
            F.col(vec_col),
            F.col("q"),
            lambda x, qi: F.abs(
                x.cast("double") - qi.cast("double") * F.col("scale") / F.lit(127.0)
            ),
        )
    )
    return d.select(id_col, "scale", "q", err.alias("max_abs_err"))


def quantize_embeddings_sql(
    table_expr: str = "embeddings", codes_as_string: bool = False
) -> str:
    """DuckDB twin of :func:`quantize_embeddings` — same floor-based
    rounding, same IEEE expression shapes, same NaN/empty-vector guard,
    generated beside the Spark code so the two dialects cannot drift.

    ``codes_as_string=True`` emits the codes as a comma-joined string
    column ``q_str`` instead of ``q array<int>`` — the driver's pandas
    canonicalizer cannot sort/hash list-typed columns (r4 red row), and
    int→string casting is representation-identical in both engines.
    """
    # NaN/empty guard mirrors the Spark side: list_max of an empty list is
    # NULL in DuckDB too, and any NaN element makes the raw max NaN.
    scale = (
        "(case when isnan(list_max(list_transform(embedding, "
        "x -> abs(cast(x as double))))) then null "
        "else list_max(list_transform(embedding, "
        "x -> abs(cast(x as double)))) end)"
    )
    q = (
        "case when scale is null then null else "
        "list_transform(embedding, x -> cast(case when scale = 0.0 then 0 "
        "else greatest(-127, least(127, "
        "floor(cast(x as double) / scale * 127.0 + 0.5))) end as int)) end"
    )
    err = (
        "list_max(list_transform(range(1, len(embedding) + 1), "
        "i -> abs(cast(embedding[i] as double) "
        "- cast(q[i] as double) * scale / 127.0)))"
    )
    q_proj = "array_to_string(q, ',') as q_str" if codes_as_string else "q"
    return (
        f"select vec_id, scale, {q_proj}, {err} as max_abs_err from ("
        f"select vec_id, embedding, scale, {q} as q from ("
        f"select vec_id, embedding, {scale} as scale from {table_expr}))"
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
        qid: [float(x) for x in v]
        for qid, v in _collect_queries(embeddings, query_ids, id_col, vec_col).items()
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
    qrows = _collect_queries(embeddings, query_ids, id_col, vec_col)
    return _heap_topk_many(
        spark, embeddings.select(id_col, vec_col), list(query_ids), qrows,
        k, margin, id_col, vec_col,
    )


def _heap_topk_many(
    spark: SparkSession,
    candidates: DataFrame,
    query_ids: list[int],
    qrows: dict[int, np.ndarray],
    k: int,
    margin: int,
    id_col: str,
    vec_col: str,
    key_col: str | None = None,
    probes: dict[int, frozenset] | None = None,
) -> DataFrame:
    """The shared many-query heap kernel: ONE scan of ``candidates``, a
    broadcast query matrix, per-partition top-(k+margin) pools, then a
    per-query window for the final cut. Plan size is O(1) in |Q|.

    With ``key_col``/``probes`` set (the pruned ANN forms), a row is a
    candidate for query q only when its key ∈ probes[q] — the per-query
    bucket/list restriction applied INSIDE the one scan instead of as one
    filtered plan branch per query. The caller pre-filters the scan to
    the union of all probe keys so partition pruning still applies.

    Bit-parity with the per-query Catalyst forms: dot/norm accumulate
    dimension-sequentially (the exact fold order of the ``aggregate``
    expression) and the same HALF_UP 9 dp rounding is applied, so emitted
    cosines are identical; only a >``margin``-way tie inside 5e-10 at the
    k boundary could reorder the cut (documented, unpinned — real
    embeddings never get there).
    """
    from decimal import ROUND_HALF_UP, Decimal

    qmat = np.stack([qrows[qid] for qid in query_ids])  # (Q, D)
    # np.dot per query — the exact qn arithmetic of cosine_topk/the golden
    qns = np.array(
        [float(np.sqrt(np.dot(qrows[qid], qrows[qid]))) for qid in query_ids]
    )
    probe_sets = (
        [probes[qid] for qid in query_ids] if probes is not None else None
    )
    bc = spark.sparkContext.broadcast((list(query_ids), qmat, qns, probe_sets))
    keep = k + margin
    q9 = Decimal("0.000000001")
    cols = [id_col, vec_col] + ([key_col] if key_col else [])

    def gen(batches):
        b_qids, b_qmat, b_qns, b_probes = bc.value
        nq, dim = b_qmat.shape
        # per-query candidate pools for this partition
        pool_cos: list[list[float]] = [[] for _ in range(nq)]
        pool_ids: list[list[int]] = [[] for _ in range(nq)]
        for pdf in batches:
            if len(pdf) == 0:  # empty partitions yield empty batches
                continue
            ids = pdf[id_col].to_numpy()
            keys = pdf[key_col].to_numpy() if b_probes is not None else None
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
                if b_probes is not None:
                    pj = b_probes[j]
                    mask &= np.array([kk in pj for kk in keys])
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

    cand = candidates.select(*cols).mapInPandas(
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


def _collect_queries(
    embeddings: DataFrame, query_ids: list[int], id_col: str, vec_col: str
) -> dict[int, np.ndarray]:
    """Collect the |Q| query vectors once (bounded — queries are few).
    Shared by every ANN entry point so a caller composing two paths pays
    one collection, not two."""
    qrows = {
        r[id_col]: np.array(list(r[vec_col]), dtype=np.float64)
        for r in embeddings.filter(F.col(id_col).isin(query_ids)).collect()
    }
    missing = [qid for qid in query_ids if qid not in qrows]
    if missing:
        raise ValueError(f"query ids not found in {id_col}: {missing}")
    return qrows


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


def _ivf_train(
    embeddings: DataFrame, nlist: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Bounded, count-free training collect: deterministic hash-ordered
    top-IVF_TRAIN_CAP (TakeOrdered — a distributed heap, no full sort, no
    separate ``count()`` action to size a modulus). Collected rows are
    re-sorted by id driver-side so that whenever n ≤ cap the training
    matrix is exactly the id-ordered full corpus — the same matrix the
    oracle twin trains on."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(
            F.xxhash64(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
        )
        .limit(IVF_TRAIN_CAP)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    train = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    return train_ivf_centroids(train, nlist)


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
    cent = _ivf_train(embeddings, nlist, id_col, vec_col)
    bc = spark.sparkContext.broadcast(cent)

    @pandas_udf("int")
    def list_id(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        scores = ivf_assignment_scores(mat, bc.value)
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    listed = embeddings.withColumn("ivf_list", list_id(F.col(vec_col)))

    qrows = _collect_queries(embeddings, query_ids, id_col, vec_col)
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


NEAR_DUP_BITS = 6  # kept: legacy single-table bucket width (tests compare)
NEAR_DUP_THRESHOLD = 0.35
NEAR_DUP_TABLES = 4  # B independent hyperplane tables
NEAR_DUP_BAND_BITS = 8  # r sign bits per table → 256 buckets/table
NEAR_DUP_MAX_BUCKET = 1000  # hot-bucket cap (same guard as MinHash bands)


def _pair_dot_expr(a: F.Column, b: F.Column) -> F.Column:
    """Catalyst dot product of two array columns (sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def band_keys_py(vec: np.ndarray, planes: np.ndarray, tables: int, bits: int) -> list[int]:
    """Per-table band keys of one vector (scalar twin for goldens/tests).
    ``planes`` is the (tables·bits, dim) matrix; table t owns rows
    [t·bits, (t+1)·bits)."""
    signs = planes @ np.asarray(vec, dtype=np.float64) > 0.0
    w = 1 << np.arange(bits)
    return [int((signs[t * bits : (t + 1) * bits] * w).sum()) for t in range(tables)]


def lsh_band_keys(
    spark: SparkSession,
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = NEAR_DUP_TABLES,
    bits: int = NEAR_DUP_BAND_BITS,
    seed: int = LSH_SEED,
) -> DataFrame:
    """(id, band_idx, band_key) — one row per hyperplane table, the
    sign-bit analog of :func:`dedup.minhash_bands`. One Arrow-batched
    matrix multiply per batch; the explode is narrow (tables ≤ 8)."""
    planes = _planes(dim, tables * bits, seed)
    bc = spark.sparkContext.broadcast(planes)

    @pandas_udf("array<int>")
    def keys(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        signs = mat @ bc.value.T > 0.0  # (batch, tables·bits)
        w = (1 << np.arange(bits)).astype(np.int64)
        per_table = [
            (signs[:, t * bits : (t + 1) * bits] @ w).astype(np.int32)
            for t in range(tables)
        ]
        arr = np.stack(per_table, axis=1)  # (batch, tables)
        return pd.Series(list(arr))

    keyed = embeddings.select(id_col, keys(F.col(vec_col)).alias("__keys"))
    return keyed.select(
        id_col, F.posexplode("__keys").alias("band_idx", "band_key")
    )


def embedding_near_dup_pairs(
    spark: SparkSession,
    embeddings: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    tables: int = NEAR_DUP_TABLES,
    bits: int = NEAR_DUP_BAND_BITS,
    max_bucket: int = NEAR_DUP_MAX_BUCKET,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    observation=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — banded multi-table LSH
    (the MinHash band trick applied to hyperplane sign bits): B
    independent tables of r bits each; candidates are pairs sharing a
    full r-bit key in ANY table; exact fold-cosine ≥ threshold verifies.

    Why banded (vs the earlier single 6-bit table): with one table the
    corpus lands in only 2^bits buckets, so within-bucket pairing
    degenerates toward n²/2^bits at corpus scale, and raising bits alone
    trades recall away (P[all bits agree] = p^bits). B tables of r bits
    give P[candidate] = 1−(1−p^r)^B — at p=0.9: single-6-bit 0.53 vs
    4×8-bit 0.90 recall — while each table's 2^r-way split plus the
    ``max_bucket`` hot-bucket cap bounds Σ n_b² per table. Same guard,
    same shape, same skew story as ``near_dup_pairs_minhash``
    (dedup.py): candidate generation shuffles only (id, band_key) pairs;
    the embedding vectors join in AFTER the candidate set is distinct
    and small.

    Deterministic (seeded planes) — the fixtures twin reproduces the
    exact row set. Pass a :class:`pyspark.sql.Observation` as
    ``observation`` to report (n_buckets_dropped, n_rows_in_dropped)
    with the action (``dedup.attach_bucket_audit``) — the hot-bucket
    cap is auditable, never silent.
    """
    from socialmapper_spark.operators.dedup import attach_bucket_audit

    dim = len(embeddings.select(vec_col).first()[0])
    bands = lsh_band_keys(
        spark, embeddings, dim, id_col, vec_col, tables, bits
    )
    sized = bands.groupBy("band_idx", "band_key").agg(
        F.collect_list(id_col).alias("ids"), F.count("*").alias("n")
    )
    if observation is not None:
        sized = attach_bucket_audit(sized, observation, max_bucket)
    sized = sized.filter((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    cand = (
        sized.select(F.explode("ids").alias("vec_a"), "ids")
        .select("vec_a", F.explode("ids").alias("vec_b"))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .distinct()
    )
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__emb_a")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__emb_b")
    )
    pairs = cand.join(a, "vec_a").join(b, "vec_b")
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

    qrows = _collect_queries(embeddings, query_ids, id_col, vec_col)
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


def lsh_ann_topk_many(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
    margin: int = 8,
) -> DataFrame:
    """Many-query form of :func:`lsh_ann_topk`: the per-query probe sets
    still prune which rows count for which query, but the plan is ONE
    scan filtered to the UNION of all probe buckets feeding the shared
    heap kernel (``_heap_topk_many``) with a per-query bucket mask — no
    per-query plan branch, so 5 000 queries cost the same plan as 5.
    Emits the exact rows of the per-query form (same probes, fold-order
    cosine, HALF_UP rounding)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _planes(dim, bits)
    bucketed = lsh_buckets(spark, embeddings, dim, id_col, vec_col, bits)
    qrows = _collect_queries(embeddings, query_ids, id_col, vec_col)
    probes = {}
    for qid in query_ids:
        qb = lsh_bucket_py(qrows[qid], planes)
        probes[qid] = frozenset([qb] + [qb ^ (1 << i) for i in range(bits)])
    union_probe = sorted(set().union(*probes.values())) if probes else []
    pruned = bucketed.filter(F.col("bucket").isin(union_probe))
    return _heap_topk_many(
        spark, pruned, list(query_ids), qrows, k, margin, id_col, vec_col,
        key_col="bucket", probes=probes,
    )


def ivf_ann_topk_many(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlist: int = IVF_NLIST,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    margin: int = 8,
) -> DataFrame:
    """Many-query form of :func:`ivf_ann_topk`: same coarse quantizer and
    per-query nprobe lists, but one scan (union of all probed lists) into
    the shared heap kernel with a per-query list mask instead of one plan
    branch per query. Emits the exact rows of the per-query form."""
    cent = _ivf_train(embeddings, nlist, id_col, vec_col)
    bc = spark.sparkContext.broadcast(cent)

    @pandas_udf("int")
    def list_id(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        scores = ivf_assignment_scores(mat, bc.value)
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    listed = embeddings.withColumn("ivf_list", list_id(F.col(vec_col)))
    qrows = _collect_queries(embeddings, query_ids, id_col, vec_col)
    probes = {}
    for qid in query_ids:
        qscores = ivf_assignment_scores(qrows[qid][None, :], cent)[0]
        probes[qid] = frozenset(
            int(c) for c in np.argsort(qscores, kind="stable")[:nprobe]
        )
    union_probe = sorted(set().union(*probes.values())) if probes else []
    pruned = listed.filter(F.col("ivf_list").isin(union_probe))
    return _heap_topk_many(
        spark, pruned, list(query_ids), qrows, k, margin, id_col, vec_col,
        key_col="ivf_list", probes=probes,
    )
