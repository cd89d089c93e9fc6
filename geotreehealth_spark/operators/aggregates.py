"""Group-wise selection and zonal aggregation operators (SURVEY.md A1-A10).

Reference semantics:
- median-pick (A2): per StemTag, keep the crown whose area CA is closest to
  the group median (batch_sam.py:158-178). Median = interpolated middle
  ((lo+hi)/2 for even groups), like np.median; tie-break (|CA-med|, crown_id).
- zonal lidar stats (A7): per-crown mean of z for points in the crown bbox
  (delineation_utils.py:356-364); height percentiles are the engine's CHM
  generalization. Percentiles here are RANK-BASED (value at ceil(q*n), ties by
  (z, point_id)) so results are exact doubles — reproducible across engines
  with no interpolation drift.
- group-first after multi-key sort (A1): delineation_utils.py:453.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def first_by_order(df: DataFrame, key: str, order_cols: list) -> DataFrame:
    """A1: per key, first row under the given explicit total order."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def median_pick(
    df: DataFrame, key: str, value: str, id_col: str
) -> DataFrame:
    """A2: per key, the row whose `value` is nearest the group median.

    One shuffle on `key`; median computed with two windows (no second shuffle —
    same partitioning reused by Catalyst).
    """
    w_order = Window.partitionBy(key).orderBy(F.col(value).asc(), F.col(id_col).asc())
    w_all = Window.partitionBy(key)
    ranked = df.withColumn("__rn", F.row_number().over(w_order)).withColumn(
        "__n", F.count("*").over(w_all)
    )
    # interpolated median = mean of the middle one-or-two values
    mid = ranked.where(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.ceil((F.col("__n") + 1) / 2))
    )
    med = mid.groupBy(key).agg(((F.min(value) + F.max(value)) / F.lit(2.0)).alias("__med"))
    w_pick = Window.partitionBy(key).orderBy(
        F.abs(F.col(value) - F.col("__med")).asc(), F.col(id_col).asc()
    )
    return (
        df.join(med, key)
        .withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__med")
    )


def rank_percentile(
    df: DataFrame,
    key: str,
    value: str,
    tie_col: str,
    quantiles: dict[str, float],
) -> DataFrame:
    """A7: exact rank-based percentiles per group, one output column per q.

    value at row_number == max(1, ceil(q * n)) under (value, tie_col) order.
    Single shuffle on `key`; both windows share its partitioning.
    """
    w_order = Window.partitionBy(key).orderBy(F.col(value).asc(), F.col(tie_col).asc())
    w_all = Window.partitionBy(key)
    ranked = df.withColumn("__rn", F.row_number().over(w_order)).withColumn(
        "__n", F.count("*").over(w_all)
    )
    aggs = []
    for name, q in quantiles.items():
        target = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("__n")))
        aggs.append(F.max(F.when(F.col("__rn") == target, F.col(value))).alias(name))
    return ranked.groupBy(key).agg(*aggs)
