"""Distributed greedy NMS with exact sequential-parity (SURVEY.md W3/W4).

Reference semantics (get_polygons.py:785-819): sort polygons by score desc,
walk the list; a polygon is suppressed iff a *kept* higher-priority polygon
overlaps it with inter/max(areaA, areaB) > threshold. Weighted variant
(batch_sam.py:692-731) uses a computed priority score and IoU > 0.5.

Greedy NMS is order-sequential and global — the classic hazard for
distribution (SURVEY.md §7 hazard 1). The engine reformulates it exactly:

1. CONFLICT GRAPH (distributed): cell-partitioned self-join (overlap.py)
   yields all pairs with overlap-criterion > threshold; each edge is oriented
   winner→loser by the global total order (score desc, id asc). Pair
   discovery is exact: overlapping polygons share a covering cell.
2. FIXPOINT (driver loop over tiny frontier): sequential greedy is equivalent
   to: "a node is suppressed iff it has a surviving in-neighbor". Iterate:
   nodes with no live incoming edges are decided-kept; their out-neighbors are
   decided-suppressed; edges out of suppressed nodes die. Each round decides
   at least every current source node, so rounds ≈ longest suppression chain
   (short in practice: crowns overlap a handful of neighbors). All per-round
   work is joins/aggregations on the EDGE list, which is ~O(overlapping
   pairs) — tiny relative to the input — so the driver loop is cheap and the
   heavy lifting (pair discovery) happened once, fully distributed.

This reproduces the sequential result EXACTLY (proved by parity tests vs the
reference-order numpy oracle in tests/test_nms.py), unlike per-tile NMS which
drifts at tile borders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geotreehealth_spark.operators.overlap import overlap_selfjoin
from geotreehealth_spark.operators.udfs import overlap_ratio_udf, iou_udf


def nms_conflict_edges(
    polys: DataFrame,
    id_col: str,
    score_col: str,
    threshold: float,
    cell_size: float = 50.0,
    bounds: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    wkb_col: str | None = None,
    criterion: str = "overlap_ratio",
) -> DataFrame:
    """Directed conflict edges (winner, loser) under the global greedy order.

    criterion: 'overlap_ratio' (inter/max area, get_polygons.py:806-816) or
    'iou' (batch_sam.py:699). With wkb_col=None boxes are exact geometry;
    otherwise the polygon kernel refines the bbox candidates.
    """
    cols = [id_col, score_col, *bounds] + ([wkb_col] if wkb_col else [])
    pairs = overlap_selfjoin(polys.select(*cols), id_col=id_col, cell_size=cell_size, bounds=bounds)
    if wkb_col is not None:
        udf = overlap_ratio_udf if criterion == "overlap_ratio" else iou_udf
        measure = udf(F.col(f"a_{wkb_col}"), F.col(f"b_{wkb_col}"))
    else:
        from geotreehealth_spark.operators.overlap import box_iou_cols

        if criterion == "iou":
            measure = box_iou_cols(bounds=bounds)
        else:
            x0, y0, x1, y1 = bounds
            iw = F.greatest(
                F.least(F.col(f"a_{x1}"), F.col(f"b_{x1}"))
                - F.greatest(F.col(f"a_{x0}"), F.col(f"b_{x0}")),
                F.lit(0.0),
            )
            ih = F.greatest(
                F.least(F.col(f"a_{y1}"), F.col(f"b_{y1}"))
                - F.greatest(F.col(f"a_{y0}"), F.col(f"b_{y0}")),
                F.lit(0.0),
            )
            area_a = (F.col(f"a_{x1}") - F.col(f"a_{x0}")) * (F.col(f"a_{y1}") - F.col(f"a_{y0}"))
            area_b = (F.col(f"b_{x1}") - F.col(f"b_{x0}")) * (F.col(f"b_{y1}") - F.col(f"b_{y0}"))
            measure = (iw * ih) / F.greatest(area_a, area_b)

    conflicts = pairs.where(measure > threshold)
    # orient by global greedy order: (score desc, id asc)
    a_wins = (F.col(f"a_{score_col}") > F.col(f"b_{score_col}")) | (
        (F.col(f"a_{score_col}") == F.col(f"b_{score_col}"))
        & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
    )
    return conflicts.select(
        F.when(a_wins, F.col(f"a_{id_col}")).otherwise(F.col(f"b_{id_col}")).alias("winner"),
        F.when(a_wins, F.col(f"b_{id_col}")).otherwise(F.col(f"a_{id_col}")).alias("loser"),
    ).distinct()


def greedy_nms(
    polys: DataFrame,
    id_col: str,
    score_col: str,
    threshold: float = 0.3,
    cell_size: float = 50.0,
    bounds: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    wkb_col: str | None = None,
    criterion: str = "overlap_ratio",
    max_rounds: int = 64,
) -> DataFrame:
    """polys + `selected` boolean, exactly matching sequential greedy NMS."""
    # localCheckpoint each round: the fixpoint otherwise builds an
    # exponentially-deep logical plan (classic iterative-DataFrame trap) and
    # the driver burns all its time in Catalyst re-analysis.
    edges = nms_conflict_edges(
        polys, id_col, score_col, threshold, cell_size, bounds, wkb_col, criterion
    ).localCheckpoint(eager=True)

    suppressed_acc: DataFrame | None = None
    for _ in range(max_rounds):
        if edges.limit(1).count() == 0:
            break
        # kept-for-sure: winners that are nobody's loser in the live graph
        losers = edges.select(F.col("loser").alias("id")).distinct()
        kept_now = (
            edges.select(F.col("winner").alias("id"))
            .distinct()
            .join(losers, "id", "left_anti")
        )
        # their direct losers are suppressed for good
        newly_suppressed = (
            edges.join(kept_now.withColumnRenamed("id", "winner"), "winner")
            .select(F.col("loser").alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if newly_suppressed.limit(1).count() == 0:
            break  # no sources left → remaining graph is empty (DAG is acyclic)
        suppressed_acc = (
            newly_suppressed
            if suppressed_acc is None
            else suppressed_acc.unionByName(newly_suppressed)
            .distinct()
            .localCheckpoint(eager=True)
        )
        # drop edges involving suppressed nodes (they can no longer suppress),
        # and edges whose loser is already suppressed (decided)
        edges = (
            edges.join(suppressed_acc.withColumnRenamed("id", "winner"), "winner", "left_anti")
            .join(suppressed_acc.withColumnRenamed("id", "loser"), "loser", "left_anti")
            .localCheckpoint(eager=True)
        )
    if suppressed_acc is None:
        return polys.withColumn("selected", F.lit(True))
    return polys.join(
        suppressed_acc.withColumnRenamed("id", id_col).withColumn("__supp", F.lit(True)),
        id_col,
        "left",
    ).withColumn("selected", F.col("__supp").isNull()).drop("__supp")
