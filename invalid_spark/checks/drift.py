"""Distribution-drift checks across snapshots (SURVEY.md §2.3).

Numeric columns: fixed-width histograms built with one union-tagged
bucketed aggregation (partial combine applies), KS statistic computed
as an exact integer cross-product over the ≤``bins``-row histogram —
fully distributed, bit-reproducible in any SQL engine. Categorical
columns: one contingency aggregation, chi-square in exact form
(``d²/r`` terms, category-ordered fold). Only the one-row statistic
frame crosses to the driver, where p-values come from
:mod:`invalid_spark.mathutil` (no scipy) — the stage costs 1-2 scans
and one tiny shuffle regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from invalid_spark import mathutil


@dataclass
class DriftResult:
    column: str
    test: str  # ks | chi2
    statistic: float
    p_value: float
    drifted: bool
    threshold: float
    n_current: int
    n_prior: int


def ks_statistic_df(
    cur: DataFrame,
    prev: DataFrame,
    col: str,
    bins: int = 256,
    clip: tuple[float, float] | None = None,
) -> DataFrame:
    """Fully-distributed KS statistic: one row
    (column, statistic, n_cur, n_prior).

    Unlike :func:`ks_drift` (driver-side loop over collected
    histograms), everything stays in DataFrames: union-tagged scan →
    bucketed groupBy → cumulative window over ≤``bins`` rows → max
    abs CDF gap. CDF values are exact rationals (cumulative int
    count / total), so the statistic is bit-reproducible in any SQL
    engine. This is also the shape that scales: the window runs over
    the tiny histogram, never the data."""
    both = cur.select(F.col(col).cast("double").alias("v"), F.lit(1).alias("is_cur")).unionByName(
        prev.select(F.col(col).cast("double").alias("v"), F.lit(0).alias("is_cur"))
    ).filter(F.col("v").isNotNull())
    if clip is not None:
        # quantile-bounded range: outliers (exactly what a validation
        # run encounters) otherwise stretch the histogram until every
        # real value lands in one bucket; clamped edge buckets catch
        # the clipped tails
        qlo, qhi = clip
        mm = both.agg(
            F.percentile_approx("v", F.lit(qlo), F.lit(10000)).alias("lo"),
            F.percentile_approx("v", F.lit(qhi), F.lit(10000)).alias("hi"),
        ).collect()[0]
    else:
        mm = both.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = mm.lo, mm.hi
    width = (hi - lo) / bins or 1.0
    bucket = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("v") - F.lit(lo)) / F.lit(width))),
    ).alias("bucket")
    hist = both.select(bucket, "is_cur").groupBy("bucket").agg(
        F.sum("is_cur").alias("c_cur"),
        F.sum(1 - F.col("is_cur")).alias("c_prev"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # Exact-rational statistic: D = max|cdf_cur - cdf_prev|
    #   = max|cum_cur*n_prior - cum_prev*n_cur| / (n_cur*n_prior).
    # The cross-products stay in int64 (exact up to ~3e9 rows per
    # side; beyond that switch the casts to decimal(38,0)), the max is
    # order-independent, and the single final division makes the value
    # bit-identical in any SQL engine — no per-bucket float division
    # whose rounding could land on either side of round(x, 6).
    cdfs = hist.select(
        "bucket",
        F.sum("c_cur").over(w).alias("cum_cur"),
        F.sum("c_prev").over(w).alias("cum_prev"),
        F.sum("c_cur").over(tot).alias("n_cur"),
        F.sum("c_prev").over(tot).alias("n_prior"),
    )
    num = F.abs(
        F.col("cum_cur") * F.col("n_prior") - F.col("cum_prev") * F.col("n_cur")
    )
    return cdfs.select(num.alias("num"), "n_cur", "n_prior").groupBy().agg(
        F.first(F.lit(col)).alias("column_name"),
        F.when(
            (F.first("n_cur") > 0) & (F.first("n_prior") > 0),
            F.max("num").cast("double")
            / (F.first("n_cur") * F.first("n_prior")).cast("double"),
        ).otherwise(F.lit(0.0)).alias("statistic"),
        F.first("n_cur").alias("n_cur"),
        F.first("n_prior").alias("n_prior"),
    )


def chi2_statistic_df(
    cur: DataFrame,
    prev: DataFrame,
    col: str,
) -> DataFrame:
    """Fully-distributed chi-square homogeneity statistic: one row
    (column_name, statistic, dof, n_cur, n_prior). Same contract as
    :func:`ks_statistic_df` — contingency counts aggregate
    distributed (partial combine), the O(|categories|) statistic is
    a second tiny aggregation, all exact int/double math any SQL
    engine reproduces."""
    both = cur.select(F.col(col).alias("cat"), F.lit(1).alias("is_cur")).unionByName(
        prev.select(F.col(col).alias("cat"), F.lit(0).alias("is_cur"))
    )
    tab = both.groupBy("cat").agg(
        F.sum("is_cur").alias("o1"), F.sum(1 - F.col("is_cur")).alias("o2")
    )
    from pyspark.sql import Window

    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = tab.select(
        "cat", "o1", "o2",
        F.sum("o1").over(tot).alias("n"),
        F.sum("o2").over(tot).alias("m"),
    )
    # Exact-form statistic. With d = o1*m - o2*n and r = o1 + o2 the
    # textbook (o-e)^2/e homogeneity terms collapse algebraically to
    #   term = d^2 / r,  statistic = (sum of terms) / (n*m)
    # (both expected-count branches share the same integer numerator
    # d^2). d is computed as an int64 cross-product, so each term is
    # one exact division; the sum is a strict left fold over the
    # category-sorted list (F.aggregate ≙ DuckDB list_reduce), which
    # makes float accumulation order canonical across engines. The
    # category list is histogram-sized — it never holds rows.
    d = (F.col("o1") * F.col("m") - F.col("o2") * F.col("n")).cast("double")
    r = (F.col("o1") + F.col("o2")).cast("double")
    term = F.when(r > 0, d * d / r).otherwise(F.lit(0.0))
    terms = t.select("cat", term.alias("term"), "n", "m")
    folded = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("cat", "term"))),
            lambda x: x["term"],
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return terms.groupBy().agg(
        F.first(F.lit(col)).alias("column_name"),
        F.when(
            (F.first("n") > 0) & (F.first("m") > 0),
            folded
            / (F.first("n").cast("double") * F.first("m").cast("double")),
        ).otherwise(F.lit(0.0)).alias("statistic"),
        F.greatest(F.count(F.lit(1)) - 1, F.lit(1)).alias("dof"),
        F.first("n").alias("n_cur"),
        F.first("m").alias("n_prior"),
    )


STATE_SCHEMA = (
    "column_name string, test string, bucket long, cat string, cnt long, "
    "lo double, hi double, bins int, n long"
)


def numeric_state(
    df: DataFrame, col: str, bins: int = 256,
    clip: tuple[float, float] | None = None,
) -> DataFrame:
    """Persistable drift state for a numeric column: the bucketed
    histogram plus its grid (lo, hi, bins). O(bins) rows regardless
    of table size — continuous validation stores this per run instead
    of re-scanning the prior snapshot (cost per comparison drops from
    O(prior table) to O(bins))."""
    v = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    if clip is not None:
        qlo, qhi = clip
        mm = v.agg(
            F.percentile_approx("v", F.lit(qlo), F.lit(10000)).alias("lo"),
            F.percentile_approx("v", F.lit(qhi), F.lit(10000)).alias("hi"),
        ).collect()[0]
    else:
        mm = v.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = mm.lo, mm.hi
    width = ((hi - lo) / bins or 1.0) if lo is not None else 1.0
    bucket = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("v") - F.lit(lo)) / F.lit(width))),
    )
    hist = v.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return hist.select(
        F.lit(col).alias("column_name"),
        F.lit("ks").alias("test"),
        F.col("bucket").cast("long").alias("bucket"),
        F.lit(None).cast("string").alias("cat"),
        F.col("cnt").cast("long").alias("cnt"),
        F.lit(float(lo) if lo is not None else None).alias("lo"),
        F.lit(float(hi) if hi is not None else None).alias("hi"),
        F.lit(bins).alias("bins"),
        F.sum("cnt").over(tot).cast("long").alias("n"),
    )


def categorical_state(df: DataFrame, col: str) -> DataFrame:
    """Persistable drift state for a categorical column: value
    counts. O(|categories|) rows."""
    tab = df.groupBy(F.col(col).cast("string").alias("cat")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return tab.select(
        F.lit(col).alias("column_name"),
        F.lit("chi2").alias("test"),
        F.lit(None).cast("long").alias("bucket"),
        "cat",
        F.col("cnt").cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("lo"),
        F.lit(None).cast("double").alias("hi"),
        F.lit(None).cast("int").alias("bins"),
        F.sum("cnt").over(tot).cast("long").alias("n"),
    )


def ks_drift_vs_state(
    df: DataFrame, col: str, state: DataFrame, threshold: float = 0.01
) -> DriftResult:
    """KS drift of ``df[col]`` against a STORED histogram (the prior
    run's :func:`numeric_state`): the current side is bucketed on the
    stored grid (one aggregation of the current table; the prior
    snapshot is never touched), the statistic is the same exact
    integer cross-multiplication over two ≤bins histograms,
    driver-side over O(bins) numbers."""
    srows = [r for r in state.collect() if r["test"] == "ks" and r["column_name"] == col]
    if not srows:
        raise ValueError(f"no stored ks state for column [{col}]")
    lo, hi, bins = srows[0]["lo"], srows[0]["hi"], srows[0]["bins"]
    m = srows[0]["n"]
    prev = [0] * bins
    for r in srows:
        prev[int(r["bucket"])] = r["cnt"]
    width = (hi - lo) / bins or 1.0
    bucket = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)),
        ),
    )
    rows_ = (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    cur = [0] * bins
    for r in rows_:
        cur[int(r["bucket"])] = r["cnt"]
    n = sum(cur)
    num, cc, cp = 0, 0, 0
    for a, b in zip(cur, prev):
        cc += a
        cp += b
        num = max(num, abs(cc * m - cp * n))
    d = (num / (n * m)) if n and m else 0.0
    p = mathutil.ks_pvalue(d, n, m) if n and m else 1.0
    return DriftResult(col, "ks", d, p, p < threshold, threshold, n, m)


def chi2_drift_vs_state(
    df: DataFrame, col: str, state: DataFrame, threshold: float = 0.01
) -> DriftResult:
    """Chi-square drift against stored category counts."""
    srows = [
        r for r in state.collect()
        if r["test"] == "chi2" and r["column_name"] == col
    ]
    if not srows:
        raise ValueError(f"no stored chi2 state for column [{col}]")
    prev = {r["cat"]: r["cnt"] for r in srows}
    cur = {
        r["cat"]: r["cnt"]
        for r in df.groupBy(F.col(col).cast("string").alias("cat"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    cats = sorted(set(prev) | set(cur), key=str)
    n, m = sum(cur.values()), sum(prev.values())
    stat = 0.0
    for cat in cats:
        o1, o2 = cur.get(cat, 0), prev.get(cat, 0)
        r = o1 + o2
        if r > 0:
            d = o1 * m - o2 * n
            stat += (float(d) * float(d)) / r
    stat = stat / (n * m) if n and m else 0.0
    dof = max(len(cats) - 1, 1)
    p = mathutil.chi2_pvalue(stat, dof) if n and m else 1.0
    return DriftResult(col, "chi2", stat, p, p < threshold, threshold, n, m)


def ks_drift(
    cur: DataFrame,
    prev: DataFrame,
    col: str,
    bins: int = 256,
    threshold: float = 0.01,
    clip: tuple[float, float] | None = None,
) -> DriftResult:
    """Two-sample KS over binned CDFs. ``threshold`` is the p-value
    below which drift is flagged.

    Thin wrapper over the fully-distributed :func:`ks_statistic_df`
    (one union-tagged scan for the range + one for the histogram —
    never a per-side re-scan); only the one-row statistic frame
    crosses to the driver, where the p-value is computed.

    ``clip=(0.01, 0.99)`` bounds the histogram range by quantiles
    instead of min/max — see :func:`ks_statistic_df`."""
    row = ks_statistic_df(cur, prev, col, bins=bins, clip=clip).collect()[0]
    d = float(row.statistic or 0.0)
    n, m = int(row.n_cur or 0), int(row.n_prior or 0)
    p = mathutil.ks_pvalue(d, n, m) if n and m else 1.0
    return DriftResult(col, "ks", d, p, p < threshold, threshold, n, m)


def chi2_drift(
    cur: DataFrame, prev: DataFrame, col: str, threshold: float = 0.01
) -> DriftResult:
    """Chi-square homogeneity test on categorical value counts.

    Thin wrapper over the fully-distributed
    :func:`chi2_statistic_df` (one union-tagged scan, partial
    combine); the driver only computes the p-value from the one-row
    statistic frame."""
    row = chi2_statistic_df(cur, prev, col).collect()[0]
    stat, dof = float(row.statistic or 0.0), int(row.dof or 1)
    n, m = int(row.n_cur or 0), int(row.n_prior or 0)
    p = mathutil.chi2_pvalue(stat, dof) if n and m else 1.0
    return DriftResult(col, "chi2", stat, p, p < threshold, threshold, n, m)
