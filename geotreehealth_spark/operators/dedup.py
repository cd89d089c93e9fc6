"""Keep-best dedup windows (SURVEY.md P9/W5) and value recodes (P11/P12).

Reference semantics:
- keep-max-DBH: sort desc by DBH then drop_duplicates('StemTag')
  (batch_sam.py:741); keep-latest-Year likewise (batch_sam.py:765).
  The reference relies on pandas sort stability for ties (SURVEY.md §7
  hazard 2); we pin an explicit (order_col desc, tie_col desc) total order.
- recode: Status 'D'→'DS' (main.py:159); 'A'→'AU' when FAD non-null (tmp.py:13).
- factorize: pd.factorize(labels) → dense ints (main.py:179-180), made
  deterministic via dense_rank over the sorted distinct values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keep_best(
    df: DataFrame, key: str, order_col: str, tie_col: str, descending: bool = True
) -> DataFrame:
    """One row per `key`: max (or min) `order_col`, ties by `tie_col` desc."""
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tie_col).desc(),
    ]
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def recode_status(status: Column, fad: Column) -> Column:
    """'D'→'DS'; 'A'→'AU' when fad non-null (main.py:159; tmp.py:13)."""
    return (
        F.when(status == "D", F.lit("DS"))
        .when((status == "A") & fad.isNotNull(), F.lit("AU"))
        .otherwise(status)
    )


def factorize(df: DataFrame, col: str, out_col: str = "label_id") -> DataFrame:
    """Deterministic label encode: distinct values sorted → dense 0..n-1 ids."""
    w = Window.orderBy(F.col(col).asc())
    return (
        df.select(col)
        .distinct()
        .withColumn(out_col, F.dense_rank().over(w) - 1)
    )
