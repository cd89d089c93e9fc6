"""Driver contract: entry() smoke, queries() + oracle_sql() correctness gate.

Each queries() entry exercises one operator family from SURVEY.md §2 through
the real engine code (geotreehealth_spark.operators.*); the oracle SQL rebuilds
the same result in DuckDB from the same parquet tables, using the shared-
dialect derived views in geotreehealth_spark.synth (bit-identical arithmetic in
both engines — see synth.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geotreehealth_spark import synth
from geotreehealth_spark.operators import aggregates, dedup, knn, overlap, pip_join, rebalance, tiling

V = synth.ORACLE_VIEWS
PLOT_BOUNDS = ("pxmin", "pymin", "pxmax", "pymax")
DIST_SQL = "SQRT((s.x - c.cx) * (s.x - c.cx) + (s.y - c.cy) * (s.y - c.cy))"


def _recoded_stems(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = synth.stems(spark, sf_dir)
    return s.withColumn("status_r", dedup.recode_status(F.col("status"), F.col("fad")))

RECODE_SQL = (
    "SELECT stems.*, CASE WHEN status = 'D' THEN 'DS' "
    "WHEN status = 'A' AND fad IS NOT NULL THEN 'AU' ELSE status END AS status_r FROM stems"
)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_pip_stems_plots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: PIP assignment of field stems to plot boundaries (filter-refine)."""
    stems = synth.stems(spark, sf_dir)
    plots = synth.plots(spark)
    out = pip_join.pip_join(
        stems, plots, cell_size=50.0, poly_wkb=None, poly_bounds=PLOT_BOUNDS
    )
    return out.select("stem_tag", "plot_id")


def q_pip_assign_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: per crown, contained stem nearest the crown centroid (tie-break)."""
    stems = synth.stems(spark, sf_dir)
    crowns = synth.crowns(spark, sf_dir).drop("stem_tag")  # avoid name collision
    out = pip_join.pip_assign_best(
        stems, crowns, poly_id="crown_id", point_id="stem_tag",
        cell_size=25.0, poly_wkb=None,
    )
    return out.select("crown_id", "stem_tag", "dist")


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: exact k=6 nearest crowns per probe stem via cell-ring pruning."""
    stems = synth.stems(spark, sf_dir).where(F.col("stem_key") % 50 == 0)
    crowns = synth.crowns(spark, sf_dir).drop("stem_tag")
    out = knn.knn_join(
        stems, crowns, k=6, left_id="stem_tag", right_id="crown_id",
    )
    return out.select("stem_tag", "crown_id", "dist", "knn_rank")


def q_knn_quadrant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: nearest crown per cardinal quadrant, remove_too_close=3 m."""
    stems = synth.stems(spark, sf_dir).where(F.col("stem_key") % 50 == 0)
    crowns = synth.crowns(spark, sf_dir).drop("stem_tag")
    out = knn.quadrant_knn_join(
        stems, crowns, left_id="stem_tag", right_id="crown_id", min_dist=3.0,
    )
    return out.select("stem_tag", "quadrant", "crown_id", "dist")


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: crowns × overlapping raster tiles (broadcast range join)."""
    crowns = synth.crowns(spark, sf_dir)
    tiles = synth.tiles(spark)
    return tiling.assign_tiles(crowns, tiles).select("crown_id", "tile_id")


def q_boundary_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: tile assignment minus crowns within 0.5 m of the window edge."""
    crowns = synth.crowns(spark, sf_dir)
    tiles = synth.tiles(spark)
    assigned = tiling.assign_tiles(crowns, tiles)
    return tiling.boundary_filter(assigned, margin=0.5).select("crown_id", "tile_id")


def q_dedup_keep_max_dbh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: per dup-tag keep the max-DBH stem (batch_sam.py:741)."""
    stems = synth.stems(spark, sf_dir)
    out = dedup.keep_best(stems, key="dup_tag", order_col="dbh", tie_col="stem_key")
    return out.select("dup_tag", "stem_tag", "dbh")


def q_keep_latest_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/W5: per dup-tag keep the latest-Year stem (batch_sam.py:765)."""
    stems = synth.stems(spark, sf_dir)
    out = dedup.keep_best(stems, key="dup_tag", order_col="year", tie_col="stem_key")
    return out.select("dup_tag", "stem_tag", "year")


def q_recode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11+A3: status recode then per-(site, status) counts."""
    s = _recoded_stems(spark, sf_dir)
    return s.groupBy("site_id", "status_r").agg(F.count("*").alias("n"))


def q_class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: drop rare classes, downsample all survivors to the min size."""
    s = _recoded_stems(spark, sf_dir)
    out = rebalance.class_filter_rebalance(
        s, group_cols=["site_id", "status_r"], order_col="stem_key", min_count=10
    )
    return out.select("site_id", "status_r", "stem_tag")


def q_factorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: deterministic label encode of status values."""
    s = _recoded_stems(spark, sf_dir)
    return dedup.factorize(s, "status_r", "label_id")


def q_median_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per stem_tag, crown with area closest to the group median."""
    crowns = synth.crowns(spark, sf_dir).where(F.col("stem_tag").isNotNull())
    out = aggregates.median_pick(crowns, key="stem_tag", value="ca", id_col="crown_id")
    return out.select("stem_tag", "crown_id", "ca")


def q_zonal_lidar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-crown lidar point count / mean / min / max of z."""
    crowns = synth.crowns(spark, sf_dir)
    lidar = synth.lidar(spark, sf_dir)
    cands = pip_join.pip_join(lidar, crowns, cell_size=25.0, poly_wkb=None)
    # z is milli-quantized by construction → exact integer sum, one division
    # (summation-order-independent, so bit-identical to the oracle)
    return cands.groupBy("crown_id").agg(
        F.count("*").alias("n_pts"),
        (
            F.sum(F.round(F.col("z") * 1000).cast("long")).cast("double")
            / (F.lit(1000.0) * F.count("*"))
        ).alias("z_mean"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
    )


def q_zonal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: exact rank-based CHM height percentiles per crown."""
    crowns = synth.crowns(spark, sf_dir)
    lidar = synth.lidar(spark, sf_dir)
    cands = pip_join.pip_join(lidar, crowns, cell_size=25.0, poly_wkb=None)
    return aggregates.rank_percentile(
        cands.select("crown_id", "z", "point_id"),
        key="crown_id", value="z", tie_col="point_id",
        quantiles={"z_p50": 0.5, "z_p95": 0.95},
    )


def q_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: probe crowns × overlapping crowns with box-IoU > 0.3."""
    crowns = synth.crowns(spark, sf_dir).select(
        "crown_id", "crown_key", "xmin", "ymin", "xmax", "ymax"
    )
    pairs = overlap.overlap_selfjoin(
        crowns, id_col="crown_id", cell_size=50.0,
        left_filter=(F.col("crown_key") % 97 == 0),
    )
    pairs = pairs.withColumn("iou", overlap.box_iou_cols())
    return pairs.where(F.col("iou") > 0.3).select(
        F.col("a_crown_id").alias("crown_a"),
        F.col("b_crown_id").alias("crown_b"),
        "iou",
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family sanity: TPC-H Q1-style aggregation (exact decimal sums)."""
    synth.register_tpch_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2-style ranking: top-3 orders per priority by (price desc, key)."""
    synth.register_tpch_views(spark, sf_dir)
    from pyspark.sql.window import Window

    orders = spark.table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crown→stem assignment with centroid tie-break at sf0.001."""
    return q_pip_assign_best(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pip_stems_plots": q_pip_stems_plots,
        "pip_assign_best": q_pip_assign_best,
        "knn": q_knn,
        "knn_quadrant": q_knn_quadrant,
        "tile_assign": q_tile_assign,
        "boundary_filter": q_boundary_filter,
        "dedup_keep_max_dbh": q_dedup_keep_max_dbh,
        "keep_latest_year": q_keep_latest_year,
        "recode_counts": q_recode_counts,
        "class_rebalance": q_class_rebalance,
        "factorize": q_factorize,
        "median_pick": q_median_pick,
        "zonal_lidar": q_zonal_lidar,
        "zonal_percentiles": q_zonal_percentiles,
        "overlap_pairs": q_overlap_pairs,
        "tpch_q1": q_tpch_q1,
        "topk_orders": q_topk_orders,
    }


def oracle_sql() -> dict[str, str]:
    W = synth.oracle_with
    stems = ("stems", V["stems"])
    crowns = ("crowns", V["crowns"])
    plots = ("plots", V["plots"])
    tiles = ("tiles", V["tiles"])
    lidar = ("lidar", V["lidar"])
    recoded = ("stems_r", RECODE_SQL)

    return {
        "pip_stems_plots": W(stems, plots) + """
            SELECT s.stem_tag, p.plot_id
            FROM stems s JOIN plots p
              ON s.x >= p.pxmin AND s.x < p.pxmax
             AND s.y >= p.pymin AND s.y < p.pymax
        """,
        "pip_assign_best": W(stems, crowns) + f"""
            SELECT crown_id, stem_tag, dist FROM (
                SELECT c.crown_id, s.stem_tag, {DIST_SQL} AS dist
                FROM crowns c JOIN stems s
                  ON s.x >= c.xmin AND s.x < c.xmax
                 AND s.y >= c.ymin AND s.y < c.ymax
            ) QUALIFY ROW_NUMBER() OVER (
                PARTITION BY crown_id ORDER BY dist, stem_tag) = 1
        """,
        "knn": W(stems, crowns) + f"""
            SELECT stem_tag, crown_id, dist, knn_rank FROM (
                SELECT s.stem_tag, c.crown_id, {DIST_SQL} AS dist,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.stem_tag ORDER BY {DIST_SQL}, c.crown_id
                       ) AS knn_rank
                FROM stems s CROSS JOIN crowns c
                WHERE s.stem_key % 50 = 0
            ) WHERE knn_rank <= 6
        """,
        "knn_quadrant": W(stems, crowns) + f"""
            SELECT stem_tag, quadrant, crown_id, dist FROM (
                SELECT s.stem_tag, c.crown_id, {DIST_SQL} AS dist,
                       CASE WHEN c.cx >= s.x AND c.cy >= s.y THEN 'NE'
                            WHEN c.cx >= s.x AND c.cy <  s.y THEN 'SE'
                            WHEN c.cx <  s.x AND c.cy >= s.y THEN 'NW'
                            ELSE 'SW' END AS quadrant
                FROM stems s CROSS JOIN crowns c
                WHERE s.stem_key % 50 = 0
            ) WHERE dist >= 3e0
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY stem_tag, quadrant ORDER BY dist, crown_id) = 1
        """,
        "tile_assign": W(crowns, tiles) + """
            SELECT c.crown_id, t.tile_id
            FROM crowns c JOIN tiles t
              ON c.xmin < t.txmax AND c.xmax > t.txmin
             AND c.ymin < t.tymax AND c.ymax > t.tymin
        """,
        "boundary_filter": W(crowns, tiles) + """
            SELECT c.crown_id, t.tile_id
            FROM crowns c JOIN tiles t
              ON c.xmin < t.txmax AND c.xmax > t.txmin
             AND c.ymin < t.tymax AND c.ymax > t.tymin
            WHERE c.xmin >= t.txmin + 0.5e0 AND c.ymin >= t.tymin + 0.5e0
              AND c.xmax <= t.txmax - 0.5e0 AND c.ymax <= t.tymax - 0.5e0
        """,
        "dedup_keep_max_dbh": W(stems) + """
            SELECT dup_tag, stem_tag, dbh FROM stems
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY dup_tag ORDER BY dbh DESC, stem_key DESC) = 1
        """,
        "keep_latest_year": W(stems) + """
            SELECT dup_tag, stem_tag, year FROM stems
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY dup_tag ORDER BY year DESC, stem_key DESC) = 1
        """,
        "recode_counts": W(stems, recoded) + """
            SELECT site_id, status_r, COUNT(*) AS n
            FROM stems_r GROUP BY site_id, status_r
        """,
        "class_rebalance": W(stems, recoded) + """
            , cnt AS (
                SELECT site_id, status_r, COUNT(*) AS c
                FROM stems_r GROUP BY site_id, status_r HAVING COUNT(*) > 10
            ), tgt AS (SELECT MIN(c) AS m FROM cnt),
            ranked AS (
                SELECT s.site_id, s.status_r, s.stem_tag,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.site_id, s.status_r ORDER BY s.stem_key
                       ) AS rn
                FROM stems_r s
                JOIN cnt ON s.site_id = cnt.site_id AND s.status_r = cnt.status_r
            )
            SELECT site_id, status_r, stem_tag FROM ranked, tgt WHERE rn <= m
        """,
        "factorize": W(stems, recoded) + """
            SELECT status_r,
                   CAST(DENSE_RANK() OVER (ORDER BY status_r) - 1 AS INT) AS label_id
            FROM (SELECT DISTINCT status_r FROM stems_r)
        """,
        "median_pick": W(crowns) + """
            , nn AS (SELECT * FROM crowns WHERE stem_tag IS NOT NULL),
            ranked AS (
                SELECT stem_tag, crown_id, ca,
                       ROW_NUMBER() OVER (PARTITION BY stem_tag ORDER BY ca, crown_id) AS rn,
                       COUNT(*) OVER (PARTITION BY stem_tag) AS n
                FROM nn
            ),
            mid AS (
                SELECT stem_tag, (MIN(ca) + MAX(ca)) / 2e0 AS med
                FROM ranked
                WHERE rn = CAST(FLOOR((n + 1) / 2e0) AS BIGINT)
                   OR rn = CAST(CEIL((n + 1) / 2e0) AS BIGINT)
                GROUP BY stem_tag
            )
            SELECT stem_tag, crown_id, ca FROM (
                SELECT nn.stem_tag, nn.crown_id, nn.ca,
                       ROW_NUMBER() OVER (
                           PARTITION BY nn.stem_tag
                           ORDER BY ABS(nn.ca - mid.med), nn.crown_id
                       ) AS rn
                FROM nn JOIN mid ON nn.stem_tag = mid.stem_tag
            ) WHERE rn = 1
        """,
        "zonal_lidar": W(crowns, lidar) + """
            SELECT c.crown_id, COUNT(*) AS n_pts,
                   CAST(SUM(CAST(ROUND(l.z * 1000e0) AS BIGINT)) AS DOUBLE)
                       / (1000e0 * COUNT(*)) AS z_mean,
                   MIN(l.z) AS z_min, MAX(l.z) AS z_max
            FROM crowns c JOIN lidar l
              ON l.x >= c.xmin AND l.x < c.xmax
             AND l.y >= c.ymin AND l.y < c.ymax
            GROUP BY c.crown_id
        """,
        "zonal_percentiles": W(crowns, lidar) + """
            , cand AS (
                SELECT c.crown_id, l.z, l.point_id
                FROM crowns c JOIN lidar l
                  ON l.x >= c.xmin AND l.x < c.xmax
                 AND l.y >= c.ymin AND l.y < c.ymax
            ), ranked AS (
                SELECT crown_id, z,
                       ROW_NUMBER() OVER (PARTITION BY crown_id ORDER BY z, point_id) AS rn,
                       COUNT(*) OVER (PARTITION BY crown_id) AS n
                FROM cand
            )
            SELECT crown_id,
                   MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.5e0 * n) AS BIGINT))
                            THEN z END) AS z_p50,
                   MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.95e0 * n) AS BIGINT))
                            THEN z END) AS z_p95
            FROM ranked GROUP BY crown_id
        """,
        "overlap_pairs": W(crowns) + """
            SELECT crown_a, crown_b, iou FROM (
                SELECT a.crown_id AS crown_a, b.crown_id AS crown_b,
                       GREATEST(LEAST(a.xmax, b.xmax) - GREATEST(a.xmin, b.xmin), 0e0)
                       * GREATEST(LEAST(a.ymax, b.ymax) - GREATEST(a.ymin, b.ymin), 0e0)
                       / ((a.xmax - a.xmin) * (a.ymax - a.ymin)
                          + (b.xmax - b.xmin) * (b.ymax - b.ymin)
                          - GREATEST(LEAST(a.xmax, b.xmax) - GREATEST(a.xmin, b.xmin), 0e0)
                            * GREATEST(LEAST(a.ymax, b.ymax) - GREATEST(a.ymin, b.ymin), 0e0))
                       AS iou
                FROM crowns a JOIN crowns b
                  ON a.crown_id <> b.crown_id
                 AND a.xmin < b.xmax AND a.xmax > b.xmin
                 AND a.ymin < b.ymax AND a.ymax > b.ymin
                WHERE a.crown_key % 97 = 0
            ) WHERE iou > 0.3e0
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "topk_orders": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS INT) AS rk
                FROM orders
            ) WHERE rk <= 3
        """,
    }
