"""Per-column statistics stage (SURVEY.md §2.3).

All requested stats for all columns are computed in ONE partial+final
hash aggregation over a single column-pruned scan — at 100 TB this is
one shuffle of a handful of bytes per partition (partial aggregates),
never a per-column pass.

- null_rate / min / max: plain aggregates;
- ndv: ``approx_count_distinct`` (HyperLogLog++, built-in) with an
  exact option for oracle parity at small scale;
- quantiles: ``percentile_approx`` (built-in sketch) with an exact
  option, plus a true **t-digest** path (:func:`tdigest_quantiles`)
  built from per-partition digests merged on the driver — the
  north-star's sketch, implemented with ``applyInPandas`` partials so
  no row leaves its executor unaggregated.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    specs: list[tuple[str, list[str]]],
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = False,
    run_id: str = "",
) -> DataFrame:
    """One row per (column): requested stats as a map<string,double>.

    ``specs`` is [(column, [stat, ...])] with stats drawn from
    {null_rate, min, max, ndv, quantiles}. Single-pass, single agg.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for col, stats in specs:
        c = F.col(col)
        safe = col.replace(".", "__")
        if "null_rate" in stats:
            aggs.append(
                F.avg(c.isNull().cast("double")).alias(f"{safe}!null_rate")
            )
        if "min" in stats:
            aggs.append(F.min(c).cast("double").alias(f"{safe}!min"))
        if "max" in stats:
            aggs.append(F.max(c).cast("double").alias(f"{safe}!max"))
        if "ndv" in stats:
            expr = (
                F.countDistinct(c) if exact else F.approx_count_distinct(c, 0.02)
            )
            aggs.append(expr.cast("double").alias(f"{safe}!ndv"))
        if "quantiles" in stats:
            for q in quantiles:
                expr = (
                    F.percentile(c, F.lit(q))
                    if exact
                    else F.percentile_approx(c, F.lit(q), F.lit(10000))
                )
                aggs.append(expr.cast("double").alias(f"{safe}!q{q}"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = row.pop("__n")
    spark = df.sparkSession
    out_rows = []
    for key, val in row.items():
        colname, stat = key.split("!", 1)
        out_rows.append(
            (colname.replace("__", "."), stat, float(val) if val is not None else None,
             int(n), run_id)
        )
    return spark.createDataFrame(
        out_rows, "column string, stat string, value double, n_rows long, run_id string"
    )


# ---------------------------------------------------------------------------
# t-digest (Dunning's public algorithm, compact merging variant)


class TDigest:
    """Merging t-digest over (mean, weight) centroids."""

    def __init__(self, compression: float = 100.0):
        self.compression = compression
        self.means: list[float] = []
        self.weights: list[float] = []

    @staticmethod
    def of(values: np.ndarray, compression: float = 100.0) -> "TDigest":
        d = TDigest(compression)
        if len(values):
            vs = np.sort(values.astype(np.float64))
            d.means = vs.tolist()
            d.weights = [1.0] * len(vs)
            d._compress()
        return d

    def merge(self, other: "TDigest") -> "TDigest":
        self.means += other.means
        self.weights += other.weights
        self._compress()
        return self

    def _compress(self) -> None:
        if not self.means:
            return
        order = np.argsort(np.array(self.means))
        means = np.array(self.means)[order]
        weights = np.array(self.weights)[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        q0 = 0.0
        cur_m, cur_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            q = q0 + (cur_w + w) / total
            # k-size bound (scale function k1): limit centroid span
            limit = 4 * total * q * (1 - q) / self.compression + 1
            if cur_w + w <= limit:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(float(cur_m))
                out_w.append(float(cur_w))
                q0 += cur_w / total
                cur_m, cur_w = m, w
        out_m.append(float(cur_m))
        out_w.append(float(cur_w))
        self.means, self.weights = out_m, out_w

    def quantile(self, q: float) -> float:
        if not self.means:
            return math.nan
        total = sum(self.weights)
        target = q * total
        cum = 0.0
        for m, w in zip(self.means, self.weights):
            if cum + w >= target:
                return m
            cum += w
        return self.means[-1]

    def to_arrays(self) -> tuple[list[float], list[float]]:
        return self.means, self.weights


def tdigest_quantiles(
    df: DataFrame, col: str, qs: Iterable[float], compression: float = 100.0
) -> dict[float, float]:
    """True t-digest quantiles: per-partition digests (Arrow batches,
    vectorized) → tiny centroid tables → driver merge. The shuffle-free
    scale path; each partition ships ~compression centroids."""

    def digest_partition(batches):
        d = TDigest(compression)
        for pdf in batches:
            arr = pdf.iloc[:, 0].dropna().to_numpy(dtype=np.float64)
            if len(arr):
                d.merge(TDigest.of(arr, compression))
        m, w = d.to_arrays()
        yield pd.DataFrame({"mean": m, "weight": w})

    parts = (
        df.select(F.col(col).cast("double"))
        .mapInPandas(digest_partition, schema="mean double, weight double")
        .collect()
    )
    final = TDigest(compression)
    final.means = [r["mean"] for r in parts]
    final.weights = [r["weight"] for r in parts]
    final._compress()
    return {q: final.quantile(q) for q in qs}


ASSERT_STATS = ("null_rate", "min", "max", "mean", "ndv")


def stat_assertions(
    df: DataFrame,
    specs: list[dict],
    run_id: str = "",
) -> DataFrame:
    """Deequ-style table-level constraint verification: each spec is
    ``{"col": c, "stat": s, "min": lo?, "max": hi?}`` with ``stat`` in
    {null_rate, min, max, mean, ndv}; the output has one row per
    assertion — (col_name, stat, value, bound_min, bound_max, passed)
    — so a suite can gate a snapshot on corpus-level properties
    ("null rate under 1%", "mean in range") the way per-row rules
    gate individual records.

    ALL assertions evaluate in ONE partial+final aggregation over a
    single column-pruned scan (the multi-column pattern shared with
    drift.multi_grid); ndv is exact (count distinct) so any SQL
    engine reproduces the values bit-for-bit."""
    aggs = []
    n = F.count(F.lit(1))
    for i, spec in enumerate(specs):
        col, stat = spec["col"], spec["stat"]
        if stat not in ASSERT_STATS:
            raise ValueError(
                f"unknown assertion stat [{stat}] (choose from "
                f"{ASSERT_STATS})"
            )
        c = F.col(col)
        if stat == "null_rate":
            e = (
                F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("double")
                / n.cast("double")
            )
        elif stat == "min":
            e = F.min(c).cast("double")
        elif stat == "max":
            e = F.max(c).cast("double")
        elif stat == "mean":
            e = F.sum(c.cast("double")) / F.count(c).cast("double")
        else:  # ndv
            e = F.count_distinct(c).cast("double")
        aggs.append(e.alias(f"v_{i}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = []
    for i, spec in enumerate(specs):
        v = row[f"v_{i}"]
        lo = spec.get("min")
        hi = spec.get("max")
        passed = v is not None
        if passed and lo is not None:
            passed = v >= float(lo)
        if passed and hi is not None:
            passed = v <= float(hi)
        out.append((
            spec["col"], spec["stat"],
            float(v) if v is not None else None,
            float(lo) if lo is not None else None,
            float(hi) if hi is not None else None,
            bool(passed), run_id,
        ))
    return spark.createDataFrame(
        out,
        "col_name string, stat string, value double, bound_min double, "
        "bound_max double, passed boolean, run_id string",
    )
