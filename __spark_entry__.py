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
# training-data pipeline queries (documents / embeddings)
# --------------------------------------------------------------------------

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    synth.register_tpch_views(spark, sf_dir)
    return spark.table("documents")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import dedup as tdedup

    return tdedup.exact_dedup(_documents(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import analysis

    return analysis.fingerprint(_documents(spark, sf_dir))


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import analysis

    return analysis.text_stats(_documents(spark, sf_dir))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import analysis

    return analysis.token_count(_documents(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import analysis

    return analysis.lang_id(_documents(spark, sf_dir))


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import dedup as tdedup

    docs = _documents(spark, sf_dir).where(F.col("doc_id") % 5 == 0)
    # max_df caps hot-token posting lists (VERDICT.md "What's wrong" 5): one
    # corpus-scale stop token would otherwise drive the token self-join
    # quadratic; 50 docs/token is far above any true near-dup token here
    return tdedup.jaccard_pairs(docs, threshold=0.5, max_df=50)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geotreehealth_spark.text import similarity

    synth.register_tpch_views(spark, sf_dir)
    emb = spark.table("embeddings")
    probes = emb.where(F.col("vec_id") % 50 == 0)
    return similarity.cosine_topk(emb, probes, k=10)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate pairs (exact SQL oracle: shared-dialect
    md5-derived token hashing + identical int64 permutation arithmetic)."""
    from geotreehealth_spark.text import dedup as tdedup

    return tdedup.minhash_lsh_pairs(_documents(spark, sf_dir), n_perm=64, bands=16)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, hamming <= 3. The oracle is BRUTE FORCE over
    all pairs, so a green row certifies the pigeonhole blocking's exact recall
    (round-1 shipped max_hamming=12 on 4 chunks — guaranteed only to 3)."""
    from geotreehealth_spark.text import dedup as tdedup

    return tdedup.simhash_dedup_pairs(_documents(spark, sf_dir), max_hamming=3)


def q_rp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified random-hyperplane LSH near-dup pairs + exact cosine refine
    (8 tables x 6 planes; oracle replicates the buckets from the same plane
    constants). Random 64-d embeddings top out near cosine 0.5 → threshold 0.25."""
    from geotreehealth_spark.text import similarity

    synth.register_tpch_views(spark, sf_dir)
    emb = spark.table("embeddings")
    return similarity.rp_lsh_pairs(
        emb, dim=64, n_tables=8, n_planes=6, min_sim=0.25
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN (LSH candidates + exact cosine re-rank) — the scale path
    composition for similarity search; exact top-k stays q_ann_cosine_topk."""
    from geotreehealth_spark.text import similarity

    synth.register_tpch_views(spark, sf_dir)
    emb = spark.table("embeddings")
    probes = emb.where(F.col("vec_id") % 50 == 0)
    return similarity.ann_lsh_topk(emb, probes, k=10, dim=64, n_tables=8, n_planes=6)


NMS_SUBSET_SQL = (
    "SELECT crown_id, score, xmin, ymin, xmax, ymax FROM crowns WHERE crown_key % 5 = 0"
)
WNMS_SUBSET_SQL = """
    SELECT c.crown_id, c.xmin, c.ymin, c.xmax, c.ymax,
           CAST(s.crown_position AS DOUBLE) + s.dbh AS priority
    FROM crowns c JOIN stems s ON c.stem_tag = s.stem_tag
    WHERE c.crown_key % 3 = 0
"""


def q_nms_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: exact distributed greedy NMS, box criterion → full SQL oracle (the
    fixpoint unrolled as chained CTEs). The irregular-polygon WKB path runs the
    same fixpoint and keeps its sequential-parity pytest coverage
    (tests/test_spatial_parity.py)."""
    from geotreehealth_spark.operators import nms

    # 1-in-5 subset: the full synthetic corpus packs 2.4 crowns/m^2 in the hot
    # strip (every crown overlapping ~200 others) — an adversarial density no
    # real delineation produces and inherently Θ(n·k) ≈ 10^9 exact pairs.
    crowns = synth.crowns(spark, sf_dir).where(F.col("crown_key") % 5 == 0)
    # cell ~ crown diameter: in the dense strip a 50 m cell holds thousands of
    # crowns; 10 m keeps the candidate count near the true bbox-overlap count
    out = nms.greedy_nms(
        crowns, id_col="crown_id", score_col="score", threshold=0.3,
        cell_size=10.0, bounds=("xmin", "ymin", "xmax", "ymax"), wkb_col=None,
    )
    return out.select("crown_id", "selected")


def q_weighted_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: weighted NMS — score = (crwnpst + DBH) - Σ quantized overlap
    penalty (batch_sam.py:692-731, 579-580), box IoU > 0.5 criterion."""
    from geotreehealth_spark.operators import nms

    crowns = synth.crowns(spark, sf_dir).where(F.col("crown_key") % 3 == 0)
    stems = synth.stems(spark, sf_dir).select(
        "stem_tag", (F.col("crown_position").cast("double") + F.col("dbh")).alias("priority")
    )
    polys = crowns.join(stems, "stem_tag").select(
        "crown_id", "xmin", "ymin", "xmax", "ymax", "priority"
    )
    out = nms.weighted_nms(
        polys, id_col="crown_id", priority_col="priority", threshold=0.5,
        cell_size=10.0, criterion="iou",
    )
    return out.select("crown_id", "wscore", "selected")


def q_zonal_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: per-crown HSI band stats over synthetic tiles
    (numpy-oracle parity in tests/test_zonal.py)."""
    from geotreehealth_spark.docs import generator
    from geotreehealth_spark.operators import tiling, zonal

    crowns = synth.crowns(spark, sf_dir)
    geo = generator.crowns_with_geometry(crowns).localCheckpoint(eager=True)
    tiles = tiling.tile_grid(spark, extent=1000.0, tile_size=100.0, overlap=0.0).selectExpr(
        "tile_id", "txmin", "tymin", "txmax", "tymax",
        "concat('hsi://tile/', tile_id) AS media_ref",
        "12 AS bands", "100 AS height", "100 AS width",
    )
    out = zonal.zonal_raster_stats(geo, tiles)
    return out.select(
        "crown_id", "n_px", F.col("band_mean")[0].alias("band0_mean")
    )


def q_docs_decode_stems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-docs roundtrip under the oracle gate: synth stems → docs
    (meta/attr/geom spans) → decode → must equal the plain derivation."""
    from geotreehealth_spark.docs import decode, generator

    stems = synth.stems(spark, sf_dir)
    docs = generator.stems_to_docs(stems)
    decoded = decode.decode_stems(docs)
    return decoded.select(
        "stem_tag", "x", "y", "dbh", "year", "status", "crown_position", "fad", "site_id"
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
        "dedup_exact": q_dedup_exact,
        "fingerprint": q_fingerprint,
        "text_stats": q_text_stats,
        "token_count": q_token_count,
        "lang_id": q_lang_id,
        "jaccard_pairs": q_jaccard_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "rp_lsh_pairs": q_rp_lsh_pairs,
        "ann_lsh_topk": q_ann_lsh_topk,
        "nms_greedy": q_nms_greedy,
        "weighted_nms": q_weighted_nms,
        "zonal_raster": q_zonal_raster,
        "docs_decode_stems": q_docs_decode_stems,
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
        "dedup_exact": """
            SELECT md5(text) AS text_hash, COUNT(*) AS n_docs,
                   MIN(doc_id) AS keeper_id
            FROM documents GROUP BY md5(text)
        """,
        "fingerprint": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "text_stats": r"""
            SELECT doc_id, n_chars, n_words, n_punct, avg_word_len,
                   CASE WHEN n_words < 5 THEN 0e0
                        WHEN avg_word_len < 2e0 THEN 0.25e0
                        WHEN avg_word_len > 12e0 THEN 0.25e0
                        ELSE 1e0 END AS quality
            FROM (
                SELECT doc_id,
                       LENGTH(text) AS n_chars,
                       LEN(string_split_regex(trim(text), '\s+')) AS n_words,
                       LENGTH(text) - LENGTH(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS n_punct,
                       CAST(LENGTH(text) - LEN(string_split_regex(trim(text), '\s+')) + 1 AS DOUBLE)
                           / CAST(LEN(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_word_len
                FROM documents
            )
        """,
        "token_count": r"""
            SELECT doc_id,
                   LEN(string_split_regex(trim(text), '\s+')) AS ws_tokens,
                   CAST(CEIL(LENGTH(text) / 4e0) AS BIGINT) AS bpe_tokens_est
            FROM documents
        """,
        "lang_id": _lang_id_oracle(),
        "jaccard_pairs": r"""
            WITH docs AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
            toks0 AS (
                SELECT DISTINCT doc_id, t.tok AS token
                FROM docs, UNNEST(string_split_regex(lower(text), '\s+')) AS t(tok)
                WHERE t.tok <> ''
            ),
            toks AS (
                SELECT * FROM toks0 WHERE token NOT IN (
                    SELECT token FROM toks0 GROUP BY token HAVING COUNT(*) > 50
                )
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   i / (sa.sz + sb.sz - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i / (sa.sz + sb.sz - i) >= 0.5e0
        """,
        "ann_cosine_topk": """
            SELECT probe_id, neighbor_id, sim, rank FROM (
                SELECT probe_id, neighbor_id, sim,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY probe_id ORDER BY sim DESC, neighbor_id
                       ) AS INT) AS rank
                FROM (
                    SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                           list_cosine_similarity(
                               CAST(p.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])) AS sim
                    FROM embeddings p JOIN embeddings e ON e.vec_id <> p.vec_id
                    WHERE p.vec_id % 50 = 0
                )
            ) WHERE rank <= 10
        """,
        "docs_decode_stems": W(stems) + """
            SELECT stem_tag, x, y, dbh, year, status, crown_position, fad, site_id
            FROM stems
        """,
        "nms_greedy": _nms_oracle(),
        "weighted_nms": _weighted_nms_oracle(),
        "minhash_lsh_pairs": _minhash_oracle(),
        "simhash_pairs": _simhash_oracle(),
        "rp_lsh_pairs": _rp_lsh_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
    }


def _nms_oracle() -> str:
    from geotreehealth_spark.operators.nms import greedy_nms_box_oracle_sql

    polys = synth.oracle_with(("crowns", V["crowns"])) + NMS_SUBSET_SQL
    return greedy_nms_box_oracle_sql(
        polys, id_col="crown_id", score_col="score", threshold=0.3,
        criterion="overlap_ratio", rounds=40,
    )


def _weighted_nms_oracle() -> str:
    from geotreehealth_spark.operators.nms import weighted_nms_box_oracle_sql

    polys = (
        synth.oracle_with(("stems", V["stems"]), ("crowns", V["crowns"]))
        + WNMS_SUBSET_SQL
    )
    return weighted_nms_box_oracle_sql(
        polys, id_col="crown_id", priority_col="priority", threshold=0.5,
        criterion="iou", rounds=40,
    )


def _minhash_oracle() -> str:
    from geotreehealth_spark.text.dedup import minhash_lsh_pairs_oracle_sql

    return minhash_lsh_pairs_oracle_sql(n_perm=64, bands=16)


def _simhash_oracle() -> str:
    from geotreehealth_spark.text.dedup import simhash_pairs_oracle_sql

    return simhash_pairs_oracle_sql(max_hamming=3)


def _rp_lsh_oracle() -> str:
    from geotreehealth_spark.text.similarity import rp_lsh_pairs_oracle_sql

    return rp_lsh_pairs_oracle_sql(dim=64, n_tables=8, n_planes=6, min_sim=0.25)


def _ann_lsh_oracle() -> str:
    from geotreehealth_spark.text.similarity import ann_lsh_topk_oracle_sql

    return ann_lsh_topk_oracle_sql(probe_pred="vec_id % 50 = 0", k=10, dim=64, n_tables=8, n_planes=6)


def _lang_id_oracle() -> str:
    from geotreehealth_spark.text.analysis import LANG_MARKERS

    def cnt(word: str) -> str:
        pad = "' ' || lower(text) || ' '"
        return (
            f"CAST(FLOOR((LENGTH({pad}) - LENGTH(REPLACE({pad}, ' {word} ', '')))"
            f" / {len(word) + 2}e0) AS INT)"
        )

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n".join(
        "(" + " + ".join(cnt(w) for w in LANG_MARKERS[lang]) + f") AS s_{lang}"
        for lang in langs
    )
    greatest = "GREATEST(" + ", ".join(f"s_{la}" for la in langs) + ")"
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
        WITH s AS (SELECT doc_id, {score_cols} FROM documents)
        SELECT doc_id, {greatest} AS lang_score, {case_sql} AS lang_pred FROM s
    """
