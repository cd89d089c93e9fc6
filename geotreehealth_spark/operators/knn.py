"""Exact distributed kNN via Morton-cell candidate pruning (SURVEY.md J5/J6).

Reference semantics:
- J5: per target point, euclidean distances to candidates, argsort, take k
  (get_polygons.py:326-329; neighbors=6 per config.py:49).
- J6: cardinal-quadrant variant — nearest candidate per NW/NE/SW/SE bucket,
  dropping candidates closer than ``remove_too_close`` = 3 m
  (batch_sam.py:427-460, 195-207; config.py:34).

Physical plan (the north_star's "cell-local broadcast candidate pruning"):
1. ring r: left points explode to their (2r+1)^2 ring cells → equi-join with
   right points on cell_id → distance expression → window rank ≤ k.
2. a left point is PROVEN complete when it found ≥ k candidates and its k-th
   distance is < r*cell_size (the ring guarantees covering radius r*cell_size
   around any point in the cell — anything closer is already a candidate).
3. survivors escalate with doubled ring radius; each escalation round handles
   an exponentially-shrinking set, so total work stays near the ring-1 cost.

Why this scales: the join is a plain shuffle equi-join on int64 cell keys —
AQE skew-splits hot cells — and the k-th-distance completeness proof makes the
result EXACT (not approximate) without ever materializing the cross product.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geotreehealth_spark.operators.pip_join import distance_expr
from geotreehealth_spark.operators.udfs import make_cell_encode_udf, make_ring_cells_udf


def _with_cells(right: DataFrame, cell_size: float, rx: str, ry: str) -> DataFrame:
    """Right side indexed by cell ONCE per kNN call (persisted by callers so
    escalation rounds reuse it instead of re-scanning + re-encoding)."""
    cell_udf = make_cell_encode_udf(cell_size)
    return right.withColumn("__cell", cell_udf(F.col(rx), F.col(ry)))


def _candidates(
    left: DataFrame,
    right_cells: DataFrame,
    cell_size: float,
    ring: int,
    lx: str,
    ly: str,
    rx: str,
    ry: str,
) -> DataFrame:
    ring_udf = make_ring_cells_udf(cell_size, ring)
    lc = left.withColumn("__cell", F.explode(ring_udf(F.col(lx), F.col(ly))))
    return (
        lc.join(right_cells, "__cell")
        .drop("__cell")
        .withColumn("dist", distance_expr(F.col(lx), F.col(ly), F.col(rx), F.col(ry)))
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_id: str,
    right_id: str,
    cell_size: float | None = None,
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("cx", "cy"),
    extent: float = 1000.0,
    min_dist: float | None = None,
    max_proof_rounds: int = 2,
) -> DataFrame:
    """Exact k nearest `right` rows per `left` row; ties broken by right_id.

    Output: all left columns + right columns + `dist` + `knn_rank` (1..k).
    ``min_dist``: drop candidates strictly closer than this (reference's
    remove_too_close, batch_sam.py:430-432) before ranking.
    ``max_proof_rounds``: ring-proof rounds before the residue goes to the
    cross-join fallback — each round costs fixed job latency, and after two
    rounds the unproven set is a handful of globally-sparse points for which
    the cross join is cheaper than more rounds.
    """
    lx, ly = left_xy
    rx, ry = right_xy
    if cell_size is None:
        # aim for ring-1 sufficiency: cell ~ expected k-th radius * 2 under
        # uniform density; escalation handles sparse regions exactly.
        n_right = right.count()
        density = max(n_right, 1) / (extent * extent)
        cell_size = max(min(2.0 * math.sqrt(k / density), extent / 2), extent / 4096)

    w = Window.partitionBy(left_id).orderBy(F.col("dist").asc(), F.col(right_id).asc())
    results = []
    remaining = left
    right_cells = _with_cells(right, cell_size, rx, ry).persist()
    ring = 1
    rounds = 0
    max_ring = max(int(math.ceil(extent / cell_size)) + 1, 2)
    while True:
        final = ring >= max_ring or rounds >= max_proof_rounds
        if final:
            # final fallback: remaining is a tiny residue (corner points /
            # globally-sparse neighborhoods) — a direct cross join beats
            # exploding a quarter-million ring cells per row
            cands = remaining.crossJoin(right_cells.drop("__cell")).withColumn(
                "dist", distance_expr(F.col(lx), F.col(ly), F.col(rx), F.col(ry))
            )
        else:
            cands = _candidates(remaining, right_cells, cell_size, ring, lx, ly, rx, ry)
        if min_dist is not None:
            cands = cands.where(F.col("dist") >= min_dist)
        ranked = cands.withColumn("knn_rank", F.row_number().over(w)).where(
            F.col("knn_rank") <= k
        )
        if final:
            results.append(ranked)
            break
        ranked = ranked.persist()  # reused by proof, semi-join, and final union
        # completeness proof: k-th neighbor strictly inside guaranteed radius
        kth = ranked.groupBy(left_id).agg(
            F.max("dist").alias("__kth"), F.count("*").alias("__n")
        )
        complete_ids = kth.where(
            (F.col("__n") >= k) & (F.col("__kth") < ring * cell_size)
        ).select(left_id)
        results.append(ranked.join(F.broadcast(complete_ids), left_id, "left_semi"))
        # checkpoint: keeps the escalation loop's plan flat across rounds
        remaining = remaining.join(
            F.broadcast(complete_ids), left_id, "left_anti"
        ).localCheckpoint(eager=True)
        if remaining.limit(1).count() == 0:
            break
        ring *= 4  # aggressive escalation: each proof round is cheap, rounds are not
        rounds += 1
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def quadrant_knn_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    cell_size: float | None = None,
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("cx", "cy"),
    extent: float = 1000.0,
    min_dist: float = 3.0,
    max_proof_rounds: int = 1,
) -> DataFrame:
    """J6: nearest `right` per cardinal quadrant around each `left` point.

    Quadrant of candidate = (dx >= 0, dy >= 0) → NE/NW/SE/SW, mirroring
    find_cardinal_direction (batch_sam.py:195-207). Candidates with
    dist < min_dist are dropped first (batch_sam.py:430-432, config.py:34).
    Output: left/right columns + quadrant + dist (one row per non-empty
    quadrant, ≤ 4 per left point).
    """
    lx, ly = left_xy
    rx, ry = right_xy
    if cell_size is None:
        n_right = right.count()
        density = max(n_right, 1) / (extent * extent)
        cell_size = max(min(8.0 * math.sqrt(1.0 / density), extent / 2), extent / 1024)

    quadrant = (
        F.when((F.col(rx) >= F.col(lx)) & (F.col(ry) >= F.col(ly)), F.lit("NE"))
        .when((F.col(rx) >= F.col(lx)) & (F.col(ry) < F.col(ly)), F.lit("SE"))
        .when((F.col(rx) < F.col(lx)) & (F.col(ry) >= F.col(ly)), F.lit("NW"))
        .otherwise(F.lit("SW"))
    )
    w = Window.partitionBy(left_id, "quadrant").orderBy(
        F.col("dist").asc(), F.col(right_id).asc()
    )
    results = []
    remaining = left
    right_cells = _with_cells(right, cell_size, rx, ry).persist()
    ring = 1
    rounds = 0
    max_ring = max(int(math.ceil(extent / cell_size)) + 1, 2)
    while True:
        final = ring >= max_ring or rounds >= max_proof_rounds
        if final:
            # empty-quadrant proofs need the whole extent anyway; the residue
            # after one ring round is small enough to cross-join directly
            cands = remaining.crossJoin(right_cells.drop("__cell")).withColumn(
                "dist", distance_expr(F.col(lx), F.col(ly), F.col(rx), F.col(ry))
            )
        else:
            cands = _candidates(remaining, right_cells, cell_size, ring, lx, ly, rx, ry)
        cands = cands.where(F.col("dist") >= min_dist).withColumn("quadrant", quadrant)
        best = cands.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop(
            "__rn"
        )
        if final:
            results.append(best)
            break
        best = best.persist()  # reused by proof, semi-join, and final union
        # a quadrant is proven complete when its best dist < ring*cell_size;
        # a LEFT point is complete when all 4 quadrants are proven (a globally
        # empty quadrant can only be proven at max_ring).
        proven = (
            best.where(F.col("dist") < ring * cell_size)
            .groupBy(left_id)
            .agg(F.count("*").alias("__nq"))
            .where(F.col("__nq") == 4)
            .select(left_id)
        )
        results.append(best.join(F.broadcast(proven), left_id, "left_semi"))
        remaining = remaining.join(
            F.broadcast(proven), left_id, "left_anti"
        ).localCheckpoint(eager=True)
        if remaining.limit(1).count() == 0:
            break
        ring *= 4  # aggressive escalation: each proof round is cheap, rounds are not
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
