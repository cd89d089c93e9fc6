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

    Plan note: the cell self-join runs on SLIM columns (id, score, bbox) so
    the quadratic candidate stream never carries WKB blobs; polygon payloads
    are joined back only for the bbox-surviving pairs (orders of magnitude
    fewer) before the exact-geometry refine.
    """
    slim = polys.select(id_col, score_col, *bounds)
    pairs = overlap_selfjoin(slim, id_col=id_col, cell_size=cell_size, bounds=bounds)
    if wkb_col is not None:
        # sound bbox prune before any Python touches the pairs: a CONVEX
        # polygon's area is >= 1/2 its bbox area (it contains the quadrilateral
        # of its 4 extreme points), and poly_inter <= box_inter, hence
        # poly_ratio <= 2 * box_ratio. Pairs with box_ratio <= threshold/2 can
        # never pass the exact test — drop them JVM-side.
        x0, y0, x1, y1 = bounds
        biw = F.greatest(
            F.least(F.col(f"a_{x1}"), F.col(f"b_{x1}"))
            - F.greatest(F.col(f"a_{x0}"), F.col(f"b_{x0}")),
            F.lit(0.0),
        )
        bih = F.greatest(
            F.least(F.col(f"a_{y1}"), F.col(f"b_{y1}"))
            - F.greatest(F.col(f"a_{y0}"), F.col(f"b_{y0}")),
            F.lit(0.0),
        )
        barea_a = (F.col(f"a_{x1}") - F.col(f"a_{x0}")) * (F.col(f"a_{y1}") - F.col(f"a_{y0}"))
        barea_b = (F.col(f"b_{x1}") - F.col(f"b_{x0}")) * (F.col(f"b_{y1}") - F.col(f"b_{y0}"))
        box_ratio = (biw * bih) / F.greatest(barea_a, barea_b)
        pairs = pairs.where(box_ratio > threshold / 2.0)
        geoms = polys.select(id_col, wkb_col)
        pairs = pairs.join(
            geoms.select(
                F.col(id_col).alias(f"a_{id_col}"), F.col(wkb_col).alias(f"a_{wkb_col}")
            ),
            f"a_{id_col}",
        ).join(
            geoms.select(
                F.col(id_col).alias(f"b_{id_col}"), F.col(wkb_col).alias(f"b_{wkb_col}")
            ),
            f"b_{id_col}",
        )
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
    # no .distinct(): overlap_selfjoin's reporting-cell rule already emits
    # each unordered pair exactly once
    return conflicts.select(
        F.when(a_wins, F.col(f"a_{id_col}")).otherwise(F.col(f"b_{id_col}")).alias("winner"),
        F.when(a_wins, F.col(f"b_{id_col}")).otherwise(F.col(f"a_{id_col}")).alias("loser"),
    )


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
    driver_fixpoint_max: int = 20_000_000,
) -> DataFrame:
    """polys + `selected` boolean, exactly matching sequential greedy NMS.

    The conflict-edge DISCOVERY is always fully distributed (the quadratic
    part). The fixpoint itself is O(edges x chain-depth): when the edge list
    fits on the driver (< driver_fixpoint_max int64 pairs) it runs as a
    vectorized numpy loop there — hundreds of rounds at milliseconds each
    instead of seconds per distributed round of tiny joins. Beyond the cap the
    distributed join-based fixpoint takes over (identical semantics).
    """
    # localCheckpoint each round: the fixpoint otherwise builds an
    # exponentially-deep logical plan (classic iterative-DataFrame trap) and
    # the driver burns all its time in Catalyst re-analysis.
    edges = nms_conflict_edges(
        polys, id_col, score_col, threshold, cell_size, bounds, wkb_col, criterion
    ).localCheckpoint(eager=True)

    if edges.count() <= driver_fixpoint_max:
        suppressed_ids = _fixpoint_local(edges.toPandas())
        if not suppressed_ids:
            return polys.withColumn("selected", F.lit(True))
        spark = polys.sparkSession
        supp_df = spark.createDataFrame(
            [(s,) for s in suppressed_ids], f"{id_col} string"
        ).withColumn("__supp", F.lit(True))
        return (
            polys.join(F.broadcast(supp_df), id_col, "left")
            .withColumn("selected", F.col("__supp").isNull())
            .drop("__supp")
        )

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


def _fixpoint_local(edge_pdf) -> list:
    """Vectorized greedy fixpoint on the driver: same rule as the distributed
    loop (a node is suppressed iff a surviving winner points at it), numpy
    per-round. Returns the suppressed ids."""
    import numpy as np
    import pandas as pd

    if len(edge_pdf) == 0:
        return []
    all_ids, codes = np.unique(
        np.concatenate([edge_pdf["winner"].to_numpy(), edge_pdf["loser"].to_numpy()]),
        return_inverse=True,
    )
    m = len(edge_pdf)
    w = codes[:m]
    l = codes[m:]
    n = len(all_ids)
    alive = np.ones(m, dtype=bool)
    suppressed = np.zeros(n, dtype=bool)
    while alive.any():
        is_loser = np.zeros(n, dtype=bool)
        is_loser[l[alive]] = True
        # edges whose winner is a source (kept for sure) suppress their loser
        decide = alive & ~is_loser[w]
        new_supp = l[decide]
        if len(new_supp) == 0:
            break  # acyclic graph: cannot happen while edges remain
        suppressed[new_supp] = True
        alive &= ~suppressed[w] & ~suppressed[l]
    return all_ids[suppressed].tolist()
