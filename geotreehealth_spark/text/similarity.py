"""Embedding similarity search — exact top-k, OR-amplified RP-LSH, bucketed ANN.

All JVM-side (round 2 removed the numpy rp-sign pandas UDF): dot products run
as F.aggregate folds over zipped arrays, hyperplanes are literal arrays baked
into the plan, and every query ships an exact DuckDB oracle built from the
same plane constants (the fold's left-to-right summation order matches the
oracle's explicit left-associated `+` chain, so the IEEE results are
bit-identical).

- cosine_topk: exact top-k cosine neighbors for a probe set; probes broadcast,
  norms precomputed per side, and ONLY slim (probe, id, sim) rows enter the
  ranking shuffle — the big side's vectors never shuffle.
- rp_lsh_pairs: near-dup pairs via L OR-amplified hyperplane tables (round 1
  had a single AND-bucket, flagged as recall-by-luck in VERDICT.md): candidate
  iff the pair collides in ANY table, then exact cosine >= min_sim refine.
- ann_lsh_topk: the 100-TB ANN composition VERDICT.md asked for — LSH bucket
  candidate generation + exact cosine re-rank, k per probe.
"""

from __future__ import annotations


import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_expr(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


# --- SQL-text expression builders (optimization round r6) -------------------
# The fold-based helpers above are the right RUNTIME shape, but building the
# literal plane/centroid arrays through F.lit costs one py4j round trip per
# element: profiled at sf0.1, DataFrame CONSTRUCTION alone cost 5-7 s per LSH
# query (ann_lsh_topk build=5.2 s vs count=1.5 s) — driver-side, before any
# Spark job ran. The builders below emit the SAME fold expression as ONE SQL
# string (a single parse call):
#   aggregate(zip_with(transform(v, x -> CAST(x AS DOUBLE)), array(c0, ...),
#             (x, y) -> x * y), 0.0e0, (acc, t) -> acc + t)
# — identical tree, identical IEEE evaluation order, ~zero build cost.
# (A flat `v[0]*c0 + v[1]*c1 + ...` expansion was tried first and REJECTED:
# 48 x 64 flat terms made whole-stage codegen emit multi-MB generated
# sources — 4.4 MiB task binaries, 12-37 s per pass vs 0.4 s for the fold —
# so the interpreted-HOF runtime shape is deliberately kept.)


def _fmt_d(x: float) -> str:
    """Render a double so Spark SQL parses it back to the same IEEE value
    (repr round-trips; an exponent suffix forces DOUBLE, not DECIMAL)."""
    s = repr(float(x))
    return s if ("e" in s or "E" in s) else s + "e0"


def _dot_lits_sql(vec: str, coeffs) -> str:
    """SQL text of _dot(transform(vec, cast-to-double), array(<coeffs>)) —
    the exact fold tree `_bucket_col`/`_ivf_listed` used to build per-literal."""
    lits = ", ".join(_fmt_d(c) for c in coeffs)
    return (
        f"aggregate(zip_with(transform(`{vec}`, x -> CAST(x AS DOUBLE)), "
        f"array({lits}), (x, y) -> x * y), 0.0e0, (acc, v) -> acc + v)"
    )


def cosine_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe (excluding self).

    Plan: norms precomputed on each side BEFORE the broadcast nested-loop join
    (once per row, not once per pair); the rank window sees only
    (probe_id, id, sim) — at |emb| x |probes| candidate volume the shuffle
    carries ~24 bytes/row instead of the two 64-float vectors."""
    e = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("__v"),
    ).withColumn("__n", _norm(F.col("__v")))
    p = (
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("__pv"),
        )
        .withColumn("__pn", _norm(F.col("__pv")))
    )
    joined = e.join(F.broadcast(p), F.col(id_col) != F.col("probe_id"))
    sim = _dot(F.col("__pv"), F.col("__v")) / (F.col("__pn") * F.col("__n"))
    slim = joined.select("probe_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        slim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH (OR-amplified)
# ---------------------------------------------------------------------------

def rp_planes(dim: int, n_tables: int, n_planes: int) -> np.ndarray:
    """Deterministic hyperplanes, shape (n_tables, n_planes, dim), seed 7."""
    rng = np.random.default_rng(7)
    return rng.standard_normal((n_tables, n_planes, dim))


def _bucket_sql(vec_col: str, table_planes: np.ndarray) -> str:
    """Sign-bit bucket of one table: Σ 2^j · [dot(vec, plane_j) >= 0] — the
    SQL-text twin of the retired fold-based _bucket_col (same left-associated
    dot chains, same when/otherwise null handling via CASE)."""
    bits = " + ".join(
        f"(CASE WHEN ({_dot_lits_sql(vec_col, table_planes[j])}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(table_planes.shape[0])
    )
    return f"CAST({bits} AS BIGINT)"


def _bucketed(
    df: DataFrame, planes: np.ndarray, id_col: str, vec_col: str, id_alias: str
) -> DataFrame:
    """(id_alias, table_idx, bucket) — one row per (row, table). The bucket
    array is ONE parsed SQL expression: 48 literal dot products built as text
    cost one py4j round trip instead of ~3000 (r6 profile: the fold builders
    spent 5+ s of pure driver time per LSH query constructing this plan)."""
    arr = "array(" + ", ".join(
        _bucket_sql(vec_col, planes[t]) for t in range(planes.shape[0])
    ) + ")"
    return df.select(
        F.col(id_col).alias(id_alias),
        F.posexplode(F.expr(arr)).alias("table_idx", "bucket"),
    )


def rp_lsh_pairs(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float = 0.25,
) -> DataFrame:
    """Near-dup pairs: same bucket in ANY of the n_tables (OR-amplification),
    then exact cosine >= min_sim. Vectors join back only for the deduped
    candidate set, so the bucket join shuffles ids, not arrays.

    r6: the bucket table is computed ONCE and persisted — the self-join's two
    sides previously each re-ran the 48-dot bucket pipeline from the scan (no
    exchange reuse across the join: the r6 before-plan shows the full subtree
    twice); the b side is now a rename of the cached a side."""
    planes = rp_planes(dim, n_tables, n_planes)
    a = _bucketed(embeddings, planes, id_col, vec_col, "id_a").persist()
    b = a.withColumnRenamed("id_a", "id_b")
    cand = (
        a.join(b, ["table_idx", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    eb = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("sim", cosine_expr(F.col("__va"), F.col("__vb")))
        .where(F.col("sim") >= min_sim)
        .select("id_a", "id_b", "sim")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: LSH candidate generation + exact cosine re-rank.

    The scale path for similarity search (VERDICT.md "the composition that
    doesn't exist yet"): each probe meets only its bucket collisions — work is
    |collisions|, not |emb| x |probes| — then cosine_topk-style re-rank over
    the candidate set. Results are the exact top-k OF THE CANDIDATE SET (ANN
    semantics); the oracle replicates the buckets so the gate is exact."""
    planes = rp_planes(dim, n_tables, n_planes)
    eb = _bucketed(embeddings, planes, id_col, vec_col, "neighbor_id")
    pb = _bucketed(probes, planes, id_col, vec_col, "probe_id")
    cand = (
        eb.join(F.broadcast(pb), ["table_idx", "bucket"])
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__pv"))
    scored = (
        cand.join(e, "neighbor_id")
        .join(F.broadcast(p), "probe_id")
        .withColumn("sim", cosine_expr(F.col("__pv"), F.col("__v")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.select("probe_id", "neighbor_id", "sim")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_centroids(dim: int, n_lists: int) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids, seed 11.

    Production IVF trains these with k-means (MLlib KMeans slots into the
    same seam); a fixed seeded draw is used here so the Spark plan and the
    SQL oracle carry IDENTICAL literals — the gate verifies the IVF
    *plumbing* (assign, probe, re-rank), which is quantizer-agnostic."""
    rng = np.random.default_rng(11)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int = 64,
    n_lists: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Spherical k-means (Lloyd's) coarse quantizer, trained distributedly.

    Fills the r4 seam: `ivf_centroids` documented that production IVF trains
    its lists with k-means; this is that trainer, expressed Spark-first —
    each round is ONE map-side job: coarse-assign every vector with the same
    zero-shuffle sort_array argmax used at query time (`_ivf_listed`), then
    a single groupBy(list_id) with per-dimension F.sum columns (map-side
    combinable, no explode — n_lists x (dim+1) doubles cross the shuffle,
    nothing else) and an n_lists-row collect. Update = per-list mean
    re-normalized to the unit sphere (cosine IVF); empty lists keep their
    previous centroid. Init defaults to the seeded `ivf_centroids` draw so
    training is reproducible run-to-run (up to float-sum association order
    across partitions — why the ORACLE-gated path keeps the seeded literals
    and the trained path is pytest-gated on recall instead).
    """
    cents = (init if init is not None else ivf_centroids(dim, n_lists)).copy()
    for _ in range(iters):
        assigned = _ivf_listed(embeddings, cents, 1, id_col, vec_col, "__id", "__v")
        rows = (
            assigned.groupBy("list_id")
            .agg(
                F.count("*").alias("__n"),
                *[
                    F.sum(F.col("__v")[i].cast("double")).alias(f"__s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        for row in rows:
            mean = np.array([row[f"__s{i}"] for i in range(dim)]) / row["__n"]
            norm = float(np.linalg.norm(mean))
            if norm > 0.0:
                cents[row["list_id"]] = mean / norm
    return cents


def _ivf_listed(
    df: DataFrame,
    cents: np.ndarray,
    n_keep: int,
    id_col: str,
    vec_col: str,
    id_alias: str,
    vec_alias: str,
) -> DataFrame:
    """(id_alias, vec_alias, list_id) — the n_keep best inverted lists per
    row, ranked by (centroid dot DESC, list index ASC). Pure Catalyst: the
    per-row ranking is sort_array over (neg-score, idx) structs, NO window
    shuffle — coarse assignment of the big side stays map-side. The struct
    array is ONE parsed SQL expression (r6): the per-literal builder cost
    ~1 s of driver time per call for the 16x64 centroid constants."""
    entries = "array(" + ", ".join(
        f"named_struct('ns', -({_dot_lits_sql(vec_col, cents[j])}), 'list_id', {j})"
        for j in range(cents.shape[0])
    ) + ")"
    top = F.expr(f"slice(sort_array({entries}), 1, {int(n_keep)})")
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(top).alias("__e"),
    ).select(id_alias, vec_alias, F.col("__e.list_id").alias("list_id"))


def ann_ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: inverted-file candidate generation + exact cosine re-rank.

    The brief's second scale path beside LSH: every vector is assigned to its
    best coarse list map-side (no shuffle — sort_array argmax over centroid
    literals), probes fan out to their nprobe best lists, and the candidate
    join is a plain equi-join on list_id — work is the probed lists'
    occupancy, not |emb| x |probes|. Exact top-k OF THE CANDIDATE SET (ANN
    semantics), identical output shape to ann_lsh_topk.

    ``centroids``: trained coarse quantizer (train_ivf_centroids); defaults
    to the seeded deterministic draw so the SQL oracle's literals match."""
    cents = centroids if centroids is not None else ivf_centroids(dim, n_lists)
    e = _ivf_listed(embeddings, cents, 1, id_col, vec_col, "neighbor_id", "__v")
    p = _ivf_listed(probes, cents, nprobe, id_col, vec_col, "probe_id", "__pv")
    # No broadcast hint on the probe side: probes fan out nprobe-x with full
    # dim-wide vectors, so at north-star probe cardinality a forced broadcast
    # is a driver-OOM risk (same rationale that removed the matching.py hint,
    # r3 item 2). AQE broadcasts it at runtime when it is actually small.
    cand = e.join(p, "list_id").where(
        F.col("neighbor_id") != F.col("probe_id")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("sim", cosine_expr(F.col("__pv"), F.col("__v")))
        .select("probe_id", "neighbor_id", "sim")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders (same plane constants, same summation order)
# ---------------------------------------------------------------------------

def _dot_duck(vec: str, plane: np.ndarray) -> str:
    """Left-associated explicit sum — matches the engine fold's IEEE order."""
    return " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE) * {float(p)!r}" for i, p in enumerate(plane)
    )


def _bucket_duck(vec: str, table_planes: np.ndarray) -> str:
    return " + ".join(
        f"(CASE WHEN ({_dot_duck(vec, table_planes[j])}) >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(table_planes.shape[0])
    )


def _buckets_duck_cte(
    src_sql: str, planes: np.ndarray, id_col: str, vec_col: str, name: str
) -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT {id_col}, {t} AS table_idx, CAST({_bucket_duck(vec_col, planes[t])} AS BIGINT)"
        f" AS bucket FROM __src_{name}__"
        for t in range(planes.shape[0])
    )
    return f"__src_{name}__ AS ({src_sql}),\n{name} AS ({selects})"


def rp_lsh_pairs_oracle_sql(
    src_sql: str = "SELECT vec_id, embedding FROM embeddings",
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 6,
    min_sim: float = 0.25,
) -> str:
    planes = rp_planes(dim, n_tables, n_planes)
    return f"""
WITH {_buckets_duck_cte(src_sql, planes, 'vec_id', 'embedding', 'bk')},
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM bk a JOIN bk b
      ON a.table_idx = b.table_idx AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim FROM (
    SELECT id_a, id_b,
           list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                  CAST(eb.embedding AS DOUBLE[])) AS sim
    FROM cand
    JOIN embeddings ea ON ea.vec_id = id_a
    JOIN embeddings eb ON eb.vec_id = id_b
) WHERE sim >= {min_sim}
"""


def _ivf_scores_duck_cte(src_sql: str, cents: np.ndarray, name: str) -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT vec_id, {j} AS list_id, ({_dot_duck('embedding', cents[j])}) AS score"
        f" FROM __srcivf_{name}__"
        for j in range(cents.shape[0])
    )
    return f"__srcivf_{name}__ AS ({src_sql}),\n{name} AS ({selects})"


def ann_ivf_topk_oracle_sql(
    probe_pred: str = "vec_id % 50 = 0",
    k: int = 10,
    dim: int = 64,
    n_lists: int = 16,
    nprobe: int = 4,
) -> str:
    """Same centroid literals, same left-associated dot order, same
    (score DESC, list_id ASC) assignment tie-break as ann_ivf_topk."""
    cents = ivf_centroids(dim, n_lists)
    e_cte = _ivf_scores_duck_cte(
        "SELECT vec_id, embedding FROM embeddings", cents, "escore"
    )
    p_cte = _ivf_scores_duck_cte(
        f"SELECT vec_id, embedding FROM embeddings WHERE {probe_pred}", cents, "pscore"
    )
    return f"""
WITH {e_cte},
{p_cte},
assign AS (
    SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY score DESC, list_id) AS rn
        FROM escore
    ) WHERE rn = 1
),
plists AS (
    SELECT vec_id, list_id FROM (
        SELECT vec_id, list_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY score DESC, list_id) AS rn
        FROM pscore
    ) WHERE rn <= {nprobe}
),
cand AS (
    SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id
    FROM plists p JOIN assign e USING (list_id)
    WHERE e.vec_id <> p.vec_id
)
SELECT probe_id, neighbor_id, sim, rank FROM (
    SELECT probe_id, neighbor_id, sim,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY sim DESC, neighbor_id
           ) AS INT) AS rank
    FROM (
        SELECT probe_id, neighbor_id,
               list_cosine_similarity(CAST(ep.embedding AS DOUBLE[]),
                                      CAST(en.embedding AS DOUBLE[])) AS sim
        FROM cand
        JOIN embeddings ep ON ep.vec_id = probe_id
        JOIN embeddings en ON en.vec_id = neighbor_id
    )
) WHERE rank <= {k}
"""


def ann_lsh_topk_oracle_sql(
    probe_pred: str = "vec_id % 50 = 0",
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 6,
) -> str:
    planes = rp_planes(dim, n_tables, n_planes)
    emb_cte = _buckets_duck_cte(
        "SELECT vec_id, embedding FROM embeddings", planes, "vec_id", "embedding", "ebk"
    )
    probe_cte = _buckets_duck_cte(
        f"SELECT vec_id, embedding FROM embeddings WHERE {probe_pred}",
        planes,
        "vec_id",
        "embedding",
        "pbk",
    )
    return f"""
WITH {emb_cte},
{probe_cte},
cand AS (
    SELECT DISTINCT p.vec_id AS probe_id, e.vec_id AS neighbor_id
    FROM ebk e JOIN pbk p
      ON e.table_idx = p.table_idx AND e.bucket = p.bucket AND e.vec_id <> p.vec_id
)
SELECT probe_id, neighbor_id, sim, rank FROM (
    SELECT probe_id, neighbor_id, sim,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY probe_id ORDER BY sim DESC, neighbor_id
           ) AS INT) AS rank
    FROM (
        SELECT probe_id, neighbor_id,
               list_cosine_similarity(CAST(ep.embedding AS DOUBLE[]),
                                      CAST(en.embedding AS DOUBLE[])) AS sim
        FROM cand
        JOIN embeddings ep ON ep.vec_id = probe_id
        JOIN embeddings en ON en.vec_id = neighbor_id
    )
) WHERE rank <= {k}
"""
