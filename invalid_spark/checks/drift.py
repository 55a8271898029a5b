"""Distribution-drift checks across snapshots (SURVEY.md §2.3).

Numeric columns: fixed-width histograms built with a bucketed
``groupBy().count()`` per snapshot (one aggregation each, partial
combine applies), KS statistic on the binned CDFs computed driver-side
over ≤``bins`` numbers. Categorical columns: value counts per
snapshot, chi-square on the contingency table. p-values from
:mod:`invalid_spark.mathutil` (no scipy).

Only histograms cross to the driver — never rows — so the stage costs
two scans + two tiny shuffles regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
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


def _histogram(df: DataFrame, col: str, lo: float, hi: float, bins: int):
    width = (hi - lo) / bins or 1.0
    b = (
        F.least(
            F.lit(bins - 1),
            F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(width))),
        )
    ).alias("bucket")
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(b)
        .groupBy("bucket")
        .count()
        .collect()
    )
    counts = [0] * bins
    for r in rows:
        counts[int(r.bucket)] = r["count"]
    return counts


def ks_statistic_df(
    cur: DataFrame,
    prev: DataFrame,
    col: str,
    bins: int = 256,
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
    cdfs = hist.select(
        "bucket",
        (F.sum("c_cur").over(w).cast("double") / F.sum("c_cur").over(tot).cast("double")).alias("cdf_cur"),
        (F.sum("c_prev").over(w).cast("double") / F.sum("c_prev").over(tot).cast("double")).alias("cdf_prev"),
        F.sum("c_cur").over(tot).alias("n_cur"),
        F.sum("c_prev").over(tot).alias("n_prior"),
    )
    return cdfs.groupBy().agg(
        F.first(F.lit(col)).alias("column_name"),
        F.max(F.abs(F.col("cdf_cur") - F.col("cdf_prev"))).alias("statistic"),
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
    e1 = (F.col("o1") + F.col("o2")) * F.col("n") / (F.col("n") + F.col("m"))
    e2 = (F.col("o1") + F.col("o2")) * F.col("m") / (F.col("n") + F.col("m"))
    term = (
        F.when(e1 > 0, (F.col("o1") - e1) * (F.col("o1") - e1) / e1).otherwise(0.0)
        + F.when(e2 > 0, (F.col("o2") - e2) * (F.col("o2") - e2) / e2).otherwise(0.0)
    )
    return t.select("cat", term.alias("term"), "n", "m").groupBy().agg(
        F.first(F.lit(col)).alias("column_name"),
        F.sum("term").alias("statistic"),
        F.greatest(F.count(F.lit(1)) - 1, F.lit(1)).alias("dof"),
        F.first("n").alias("n_cur"),
        F.first("m").alias("n_prior"),
    )


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

    ``clip=(0.01, 0.99)`` bounds the histogram range by quantiles
    instead of min/max: on dirty data a handful of outliers (exactly
    what a validation run encounters) would otherwise stretch the
    range until every real value lands in one bucket and the test
    goes blind. Clamped edge buckets catch the clipped tails."""
    both = cur.select(F.col(col).cast("double").alias("v")).unionByName(
        prev.select(F.col(col).cast("double").alias("v"))
    )
    if clip is not None:
        qlo, qhi = clip
        mm = both.agg(
            F.percentile_approx("v", F.lit(qlo), F.lit(10000)).alias("lo"),
            F.percentile_approx("v", F.lit(qhi), F.lit(10000)).alias("hi"),
        ).collect()[0]
    else:
        mm = both.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = mm.lo, mm.hi
    h1 = _histogram(cur.filter(F.col(col).isNotNull()), col, lo, hi, bins)
    h2 = _histogram(prev.filter(F.col(col).isNotNull()), col, lo, hi, bins)
    n, m = sum(h1), sum(h2)
    cdf1, cdf2, a, b2 = [], [], 0.0, 0.0
    for x, y in zip(h1, h2):
        a += x / n if n else 0.0
        b2 += y / m if m else 0.0
        cdf1.append(a)
        cdf2.append(b2)
    d = mathutil.ks_statistic(cdf1, cdf2)
    p = mathutil.ks_pvalue(d, n, m)
    return DriftResult(col, "ks", d, p, p < threshold, threshold, n, m)


def chi2_drift(
    cur: DataFrame, prev: DataFrame, col: str, threshold: float = 0.01
) -> DriftResult:
    """Chi-square homogeneity test on categorical value counts."""
    c1 = {r[col]: r["count"] for r in cur.groupBy(col).count().collect()}
    c2 = {r[col]: r["count"] for r in prev.groupBy(col).count().collect()}
    cats = sorted(set(c1) | set(c2), key=str)
    n, m = sum(c1.values()), sum(c2.values())
    total = n + m
    stat = 0.0
    for cat in cats:
        o1, o2 = c1.get(cat, 0), c2.get(cat, 0)
        e1 = (o1 + o2) * n / total
        e2 = (o1 + o2) * m / total
        if e1 > 0:
            stat += (o1 - e1) ** 2 / e1
        if e2 > 0:
            stat += (o2 - e2) ** 2 / e2
    dof = max(len(cats) - 1, 1)
    p = mathutil.chi2_pvalue(stat, dof)
    return DriftResult(col, "chi2", stat, p, p < threshold, threshold, n, m)
