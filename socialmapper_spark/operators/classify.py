"""F16 — classification binning schemes (choropleth class breaks).

Reference: socialmapper/visualization/config.py:50-65 enumerates 13
``ClassificationScheme``s and chloropleth.py:146-160 resolves them (via
geopandas → mapclassify). Two are already first-class operators
(``quantiles`` → stats.quantile_bins, ``equal_interval`` →
stats.equal_interval_bins); this module adds the rest of the well-defined
set, each re-derived from the published mapclassify semantics (upper-
bound-inclusive bins: class of y = index of first cut ≥ y).

Spark-first shapes — every scheme is "compute k-ish cuts with a bounded
aggregate, broadcast, assign by comparison":

- ``std_mean``      — one exact-decimal (mean, variance) aggregate.
- ``percentiles`` / ``box_plot`` — exact percentile cuts from the
  distributed-global-rank machinery (range shuffle + partition offsets;
  no single-reducer window), linear interpolation at fractional ranks.
- ``maximum_breaks`` — per-partition neighbor gaps after a range
  shuffle (plus the P-1 cross-partition boundary gaps from a tiny
  driver exchange), top-(k-1) gap midpoints.
- ``head_tail_breaks`` — iterated filtered means (one 1-row aggregate
  per iteration, ≤ log-ish iterations on heavy-tailed data).
- ``fisher_jenks`` — exact O(k·U²) DP on the *distinct-value histogram*
  (U = distinct values, weighted by count) collected to the driver;
  ``fisher_jenks_sampled`` caps U with a deterministic hash sample the
  way mapclassify's sampled variant does.
- ``natural_breaks`` — deterministic 1-D k-means (quantile seeding +
  Lloyd to convergence) over the same histogram. mapclassify's version
  is randomized (KMeans n_init=10); a deterministic twin is the only
  testable choice, documented divergence.
- ``defined_interval`` — the reference itself FALLS BACK to quantiles
  for this scheme (chloropleth.py:146-149); parity means doing the same.
- ``jenks_caspall`` — deterministic iterative reassignment: quantile
  seeding, then move every value to the class with the nearest mean
  until a fixed point (the published J-C forced-move loop, which has no
  randomness), over the same distinct-value histogram.
- ``max_p_classifier`` — deterministic twin: mapclassify's MaxP is a
  randomized multi-start greedy (initial=1000 random seed orders + a
  swap phase) whose fit criterion is the sum of absolute deviations
  about class medians; the twin computes the EXACT optimum of that same
  L1 objective with a DP over the distinct-value histogram (same shape
  as fisher_jenks, L1 segment cost via weighted medians). Deterministic
  and at-least-as-good fit by construction; documented divergence, the
  same pinning strategy as ``natural_breaks``.

Output convention matches stats.quantile_bins: (geoid, value, bin) with
1-based bins.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from socialmapper_spark.operators.stats import quantile_bins


# ---------------------------------------------------------------------------
# shared machinery
# ---------------------------------------------------------------------------

def _vals(census_wide: DataFrame, variable: str) -> DataFrame:
    return census_wide.filter(F.col(variable).isNotNull()).select(
        "geoid", F.col(variable).alias("value")
    )


def _assign(vals: DataFrame, cuts: list[float]) -> DataFrame:
    """mapclassify bin1d: class of y = first cut ≥ y (1-based), clamped.
    No cuts (empty/all-null input) → empty result, matching the
    empty-input behavior of quantile_bins/equal_interval_bins."""
    if not cuts:
        return vals.select(
            "geoid", "value", F.lit(None).cast("int").alias("bin")
        ).limit(0)
    k = len(cuts)
    bin0 = sum(
        (F.col("value") > F.lit(float(c))).cast("int") for c in cuts
    )
    return vals.select(
        "geoid", "value", F.least(bin0 + 1, F.lit(k)).alias("bin")
    )


def _ranked(vals: DataFrame):
    """Distributed global rank — shared kernel in operators.stats.
    Returns (ranked, n, persist_handle); callers must unpersist the
    handle once every rank-reading action has run."""
    from socialmapper_spark.operators.stats import global_rank

    return global_rank(vals)


def _percentile_cuts(ranked, n: int, pcts: list[float]) -> list[float]:
    """Exact percentiles (numpy 'linear' interpolation) from global ranks:
    value at fractional rank h=(n-1)·p/100 interpolates its two
    neighbors. Collects ≤ 2·len(pcts) rows. Empty input → no cuts."""
    if n == 0:
        return []
    needed: set[int] = set()
    marks = []
    for p in pcts:
        h = (n - 1) * p / 100.0
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        marks.append((h, lo, hi))
        needed.update((lo + 1, hi + 1))
    at = {
        r["__rank"]: r["value"]
        for r in ranked.filter(F.col("__rank").isin(list(needed)))
        .select("__rank", "value")
        .collect()
    }
    cuts = []
    for h, lo, hi in marks:
        vlo, vhi = at[lo + 1], at[hi + 1]
        cuts.append(float(vlo + (h - lo) * (vhi - vlo)))
    return cuts


def _hist_cuts_or_empty(vals: DataFrame, cut_fn, k: int, sample_cap=None):
    """Histogram → cuts via cut_fn, with the shared empty-input guard."""
    values, counts = _distinct_hist(vals, sample_cap)
    if len(values) == 0:
        return _assign(vals, [])
    return _assign(vals, cut_fn(values, counts, k))


# Driver-side histogram ceiling. The DP/Lloyd classifiers that consume the
# histogram are O(k·U²)/O(k·U·iters), so the cap is sized for driver compute
# as much as for collect volume: 10k distinct values keeps the Fisher-Jenks
# DP ~1-2 s while still being far denser than any choropleth needs (k ≤ 13
# classes). Census-style variables (U ≤ a few thousand) never hit it.
AUTO_DISTINCT_CAP = 10_000


def _distinct_hist(vals: DataFrame, sample_cap: int | None = None):
    """(values, counts) of the distinct-value histogram, driver-side.

    The aggregate is distributed and the collect is HARD-BOUNDED BY
    DEFAULT: at most ``cap`` (``sample_cap`` or ``AUTO_DISTINCT_CAP``)
    distinct-value rows ever reach the driver, via hash-ordered
    ``orderBy(xxhash64).limit(cap)`` — Spark's TakeOrdered, a distributed
    per-partition heap, so it is a guarantee (not an expected sample
    size), needs no separate ``count()`` action, and is deterministic.
    When U ≤ cap the result is exactly the full histogram (the limit is a
    no-op), so small/census-style inputs are bit-identical to an uncapped
    collect. When U > cap the kept values are a uniform hash sample with
    their true counts — a weighted sub-histogram, the same taming
    mapclassify's sampled FisherJenks applies. On a continuous column at
    corpus scale U≈n; without the cap this would be an unbounded driver
    collect in disguise."""
    cap = AUTO_DISTINCT_CAP if sample_cap is None else sample_cap
    rows = (
        vals.groupBy("value")
        .count()
        .orderBy(F.xxhash64(F.col("value").cast("string")).asc(), F.col("value").asc())
        .limit(cap)
        .collect()
    )
    rows.sort(key=lambda r: r["value"])
    return (
        np.array([r["value"] for r in rows], dtype=np.float64),
        np.array([r["count"] for r in rows], dtype=np.float64),
    )


# ---------------------------------------------------------------------------
# schemes
# ---------------------------------------------------------------------------

def std_mean_bins(
    census_wide: DataFrame,
    variable: str = "B19013_001E",
    multiples: tuple[float, ...] = (-2.0, -1.0, 1.0, 2.0),
) -> DataFrame:
    """StdMean: cuts at mean + m·std (population std), plus the max.

    Exactness across engines: mean and E[x²] come from exact decimal sums
    (values pre-rounded to 6 dp), so the double arithmetic
    ``sqrt(sumsq/n − mean²)`` is bit-identical to the DuckDB twin."""
    vals = _vals(census_wide, variable)
    row = vals.agg(
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("s"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(30,6)"))
        .cast("double")
        .alias("s2"),
        F.count("*").alias("n"),
        F.max("value").alias("mx"),
    ).collect()[0]
    n = row["n"]
    if n == 0:
        return _assign(vals, [])
    mean = row["s"] / n
    # 6dp rounding of value² can push the moment estimate a hair below
    # zero on near-constant data — clamp so std is 0, not NaN (the twin
    # oracle applies the identical greatest(·, 0))
    std = float(np.sqrt(max(row["s2"] / n - mean * mean, 0.0)))
    cuts = [mean + m * std for m in multiples]
    if row["mx"] > cuts[-1]:
        cuts.append(float(row["mx"]))
    return _assign(vals, cuts)


def percentile_bins(
    census_wide: DataFrame,
    variable: str = "B19013_001E",
    pcts: tuple[float, ...] = (1.0, 10.0, 50.0, 90.0, 99.0, 100.0),
) -> DataFrame:
    """Percentiles: cuts at the given percentiles (mapclassify default
    [1, 10, 50, 90, 99, 100])."""
    vals = _vals(census_wide, variable)
    ranked, n, handle = _ranked(vals)
    cuts = _percentile_cuts(ranked, n, list(pcts))
    handle.unpersist()
    # assignment needs only the cuts — build the returned plan on the raw
    # input (narrow scan), not the rank-carrying cached frame
    return _assign(vals, cuts)


def box_plot_bins(
    census_wide: DataFrame, variable: str = "B19013_001E", hinge: float = 1.5
) -> DataFrame:
    """BoxPlot: [q25 − h·IQR, q25, q50, q75, q75 + h·IQR] (+max if any
    high outliers) — 5 or 6 classes."""
    vals = _vals(census_wide, variable)
    ranked, n, handle = _ranked(vals)
    if n == 0:
        handle.unpersist()
        return _assign(vals, [])
    q25, q50, q75 = _percentile_cuts(ranked, n, [25.0, 50.0, 75.0])
    mx = ranked.agg(F.max("value")).collect()[0][0]  # reads the cache
    handle.unpersist()
    iqr = q75 - q25
    cuts = [q25 - hinge * iqr, q25, q50, q75, q75 + hinge * iqr]
    if mx > cuts[-1]:
        cuts.append(float(mx))
    return _assign(vals, cuts)


def defined_interval_bins(
    census_wide: DataFrame, variable: str = "B19013_001E", k: int = 5
) -> DataFrame:
    """DefinedInterval — the reference resolves this scheme to QUANTILES
    (chloropleth.py:146-149); parity reproduces that fallback."""
    return quantile_bins(census_wide, variable, k)


def maximum_breaks_bins(
    census_wide: DataFrame, variable: str = "B19013_001E", k: int = 5
) -> DataFrame:
    """MaximumBreaks: cuts at the midpoints of the k−1 largest gaps
    between consecutive sorted values, plus the max.

    Distributed: gaps computed per range-partition with a partitioned lag
    window; the P−1 cross-partition boundary gaps come from a P-row
    driver exchange (per-partition min/max). Gap ties break toward the
    larger value (deterministic; mapclassify's argsort order)."""
    vals = _vals(census_wide, variable)
    ranked, _, handle = _ranked(vals)
    w = Window.partitionBy("__pid").orderBy(F.col("value").asc(), F.col("geoid").asc())
    lagged = ranked.withColumn("__prev", F.lag("value").over(w))
    in_gaps = (
        lagged.filter(F.col("__prev").isNotNull() & (F.col("value") > F.col("__prev")))
        .select("value", "__prev")
        .withColumn("__gap", F.col("value") - F.col("__prev"))
        .orderBy(F.col("__gap").desc(), F.col("value").desc())
        .limit(k - 1)
        .collect()
    )
    # cross-partition boundary gaps: P rows of (pid, min, max)
    edges = (
        ranked.groupBy("__pid")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .orderBy("__pid")
        .collect()
    )
    handle.unpersist()
    if not edges:  # empty/all-null input
        return _assign(vals, [])
    gaps = [(r["__gap"], r["value"], r["__prev"]) for r in in_gaps]
    for a, b in zip(edges, edges[1:]):
        if b["lo"] > a["hi"]:
            gaps.append((b["lo"] - a["hi"], b["lo"], a["hi"]))
    gaps.sort(key=lambda t: (-t[0], -t[1]))
    cuts = sorted((prev + val) / 2.0 for _, val, prev in gaps[: k - 1])
    mx = max(e["hi"] for e in edges) if edges else 0.0
    cuts.append(float(mx))
    return _assign(vals, cuts)


def head_tail_bins(
    census_wide: DataFrame, variable: str = "B19013_001E", max_iter: int = 32
) -> DataFrame:
    """HeadTailBreaks (Jiang 2013): cut at the mean, recurse on the head
    (values above the mean) while it keeps splitting; final cut = max.

    Each iteration is one exact-decimal 1-row aggregate over the
    shrinking head — a driver loop of distributed jobs, never a
    single-task plan."""
    vals = _vals(census_wide, variable).persist()
    cuts: list[float] = []
    head = vals
    for _ in range(max_iter):
        row = head.agg(
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("s"),
            F.count("*").alias("n"),
            F.max("value").alias("mx"),
            F.min("value").alias("mn"),
        ).collect()[0]
        if row["n"] == 0 or row["mx"] == row["mn"]:
            break
        m = row["s"] / row["n"]
        cuts.append(float(m))
        head = head.filter(F.col("value") > F.lit(float(m)))
    mx = vals.agg(F.max("value")).collect()[0][0]
    vals.unpersist()  # cuts are final — the assignment below rescans once
    if mx is not None and (not cuts or mx > cuts[-1]):
        cuts.append(float(mx))
    return _assign(vals, cuts)


def _fisher_jenks_cuts(values: np.ndarray, counts: np.ndarray, k: int) -> list[float]:
    """Exact Fisher-Jenks DP on a weighted distinct-value histogram:
    minimize within-class sum of squared deviations. Vectorized inner
    loop; O(k·U²) time, O(k·U) memory."""
    u = len(values)
    k = min(k, u)
    cw = np.concatenate([[0.0], np.cumsum(counts)])
    cwx = np.concatenate([[0.0], np.cumsum(counts * values)])
    cwx2 = np.concatenate([[0.0], np.cumsum(counts * values * values)])

    def seg_cost(a: np.ndarray, b: int) -> np.ndarray:
        # cost of classes spanning values[a..b] inclusive (a vectorized)
        w = cw[b + 1] - cw[a]
        s = cwx[b + 1] - cwx[a]
        s2 = cwx2[b + 1] - cwx2[a]
        return s2 - s * s / w

    D = np.full((k + 1, u), np.inf)
    B = np.zeros((k + 1, u), dtype=np.int64)
    D[1] = cwx2[1:] - cwx[1:] * cwx[1:] / cw[1:]  # cost of values[0..i]
    for j in range(2, k + 1):
        for i in range(j - 1, u):
            ms = np.arange(j - 2, i)  # last index of previous class
            c = D[j - 1][ms] + seg_cost(ms + 1, i)
            am = int(np.argmin(c))
            D[j][i] = c[am]
            B[j][i] = ms[am] + 1
    # backtrack: class upper-bound values
    cuts = [float(values[u - 1])]
    i, j = u - 1, k
    while j > 1:
        start = B[j][i]
        cuts.append(float(values[start - 1]))
        i, j = start - 1, j - 1
    return sorted(cuts)


def fisher_jenks_bins(
    census_wide: DataFrame,
    variable: str = "B19013_001E",
    k: int = 5,
    sample_cap: int | None = None,
) -> DataFrame:
    """FisherJenks: optimal 1-D classification (exact DP). Pass
    ``sample_cap`` for the FISHER_JENKS_SAMPLED variant (deterministic
    hash sample bounds the histogram the way mapclassify's sampled
    classifier bounds its input)."""
    vals = _vals(census_wide, variable)
    return _hist_cuts_or_empty(vals, _fisher_jenks_cuts, k, sample_cap)


def _jenks_caspall_cuts(values: np.ndarray, counts: np.ndarray, k: int) -> list[float]:
    """Deterministic Jenks-Caspall on a weighted histogram: quantile-
    seeded labels, then reassign every value to the nearest class mean
    until stable; cuts = per-class maxima. Ties go to the lower class
    (argmin's first match), making the fixed point unique."""
    u = len(values)
    k = min(k, u)
    cum = np.cumsum(counts)
    frac = (cum - counts / 2.0) / cum[-1]
    labels = np.clip((frac * k).astype(np.int64), 0, k - 1)
    for _ in range(200):
        means = np.array(
            [
                np.average(values[labels == c], weights=counts[labels == c])
                for c in np.unique(labels)
            ]
        )
        # argmin indexes dense 0..m-1 mean positions; means are sorted
        # (values and labels are sorted), so labels stay order-consistent
        new = np.argmin(np.abs(values[:, None] - means[None, :]), axis=1)
        if np.array_equal(new, labels):
            break
        labels = new
    return sorted(float(values[labels == c].max()) for c in np.unique(labels))


def jenks_caspall_bins(
    census_wide: DataFrame, variable: str = "B19013_001E", k: int = 5
) -> DataFrame:
    """JenksCaspall: deterministic mean-reassignment classification over
    the distinct-value histogram (same driver-side shape as
    fisher_jenks: a bounded groupBy-collect, never a row collect)."""
    vals = _vals(census_wide, variable)
    return _hist_cuts_or_empty(vals, _jenks_caspall_cuts, k)


def _max_p_cuts(values: np.ndarray, counts: np.ndarray, k: int) -> list[float]:
    """Exact DP minimizing Σ within-class absolute deviation about the
    weighted class median — mapclassify MaxP's fit criterion, optimized
    exactly instead of via its randomized multi-start greedy. O(k·U²)
    time like the Fisher-Jenks DP; the L1 segment cost is closed-form
    from prefix sums once the weighted median index is found
    (vectorized searchsorted)."""
    u = len(values)
    k = min(k, u)
    cw = np.concatenate([[0.0], np.cumsum(counts)])
    cwx = np.concatenate([[0.0], np.cumsum(counts * values)])

    def seg_cost(a: np.ndarray, b: int) -> np.ndarray:
        # L1 cost of classes spanning values[a..b] inclusive (vector in a)
        W = cw[b + 1] - cw[a]
        half = cw[a] + W / 2.0
        # smallest m with cum count through m >= half the class weight
        m = np.searchsorted(cw, half, side="left") - 1
        m = np.clip(m, a, b)
        vm = values[m]
        Wl = cw[m + 1] - cw[a]
        Sl = cwx[m + 1] - cwx[a]
        S = cwx[b + 1] - cwx[a]
        return vm * Wl - Sl + (S - Sl) - vm * (W - Wl)

    D = np.full((k + 1, u), np.inf)
    B = np.zeros((k + 1, u), dtype=np.int64)
    zeros = np.zeros(u, dtype=np.int64)
    D[1] = np.array([seg_cost(zeros[: 1], i)[0] for i in range(u)])
    for j in range(2, k + 1):
        for i in range(j - 1, u):
            ms = np.arange(j - 2, i)  # last index of previous class
            c = D[j - 1][ms] + seg_cost(ms + 1, i)
            am = int(np.argmin(c))
            D[j][i] = c[am]
            B[j][i] = ms[am] + 1
    cuts = [float(values[u - 1])]
    i, j = u - 1, k
    while j > 1:
        start = B[j][i]
        cuts.append(float(values[start - 1]))
        i, j = start - 1, j - 1
    return sorted(cuts)


def max_p_bins(
    census_wide: DataFrame, variable: str = "B19013_001E", k: int = 5
) -> DataFrame:
    """MaxP classification (F16 scheme 13/13,
    reference visualization/config.py:63 MAX_P_CLASSIFIER) —
    deterministic exact-L1-DP twin of mapclassify's randomized MaxP; see
    the module docstring for the divergence rationale. Same bounded
    histogram prep as fisher_jenks."""
    vals = _vals(census_wide, variable)
    return _hist_cuts_or_empty(vals, _max_p_cuts, k)


def natural_breaks_bins(
    census_wide: DataFrame,
    variable: str = "B19013_001E",
    k: int = 5,
    max_iter: int = 100,
) -> DataFrame:
    """NaturalBreaks: 1-D k-means over the distinct-value histogram —
    deterministic variant (quantile seeding + Lloyd until fixed point;
    mapclassify's randomized KMeans cannot be pinned by a test). Cuts =
    per-class maxima, like mapclassify's NaturalBreaks bins."""
    vals = _vals(census_wide, variable)

    def nb_cuts(values, counts, kk):
        kk = min(kk, len(values))
        # quantile seeding on the weighted histogram
        cum = np.cumsum(counts)
        targets = (np.arange(1, kk + 1) - 0.5) / kk * cum[-1]
        cent = np.unique(values[np.searchsorted(cum, targets)])
        for _ in range(max_iter):
            # assign each distinct value to nearest centroid (1-D:
            # boundaries are centroid midpoints)
            bounds = (cent[:-1] + cent[1:]) / 2.0
            lab = np.searchsorted(bounds, values, side="right")
            new = np.array(
                [
                    np.average(values[lab == c], weights=counts[lab == c])
                    for c in range(len(cent))
                    if np.any(lab == c)
                ]
            )
            if len(new) == len(cent) and np.allclose(new, cent, rtol=0, atol=0):
                break
            cent = np.unique(new)
        bounds = (cent[:-1] + cent[1:]) / 2.0
        lab = np.searchsorted(bounds, values, side="right")
        return sorted(float(values[lab == c].max()) for c in np.unique(lab))

    return _hist_cuts_or_empty(vals, nb_cuts, k)
