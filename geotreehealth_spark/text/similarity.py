"""Embedding similarity search (brute-force + LSH-bucketed scale path).

- cosine_topk: exact top-k cosine neighbors for a probe set. The dot product
  runs as a JVM-side F.aggregate fold over zipped arrays (no Python); probes
  are broadcast so the big side never shuffles.
- rp_lsh_buckets / rp_lsh_topk: random-hyperplane LSH — sign bits of dot
  products with fixed deterministic hyperplanes form a bucket key; candidate
  pairs join per bucket. The 100-TB path: bucket join + exact re-rank beats
  the cross product by the bucket collision factor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
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


def cosine_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe (excluding self).

    probes: a (small) subset of the embeddings table; broadcast against the
    full table — one scan, no shuffle of the big side, rank window per probe.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__pv")
    )
    joined = embeddings.join(F.broadcast(p), F.col(id_col) != F.col("probe_id"))
    sim = cosine_expr(F.col("__pv"), F.col(vec_col))
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )


def make_rp_sign_udf(dim: int, n_planes: int = 16):
    """Deterministic random-hyperplane sign-bucket as int64."""
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((n_planes, dim))

    @F.pandas_udf(LongType())
    def rp_sign_udf(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)
        bits = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return rp_sign_udf


def rp_lsh_pairs(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float = 0.9,
) -> DataFrame:
    """Near-duplicate embedding pairs: same LSH bucket AND cosine >= min_sim."""
    udf = make_rp_sign_udf(dim, n_planes)
    bucketed = embeddings.withColumn("__bucket", udf(F.col(vec_col)))
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__bucket"
    )
    return (
        a.join(b, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_expr(F.col("__va"), F.col("__vb")))
        .where(F.col("sim") >= min_sim)
        .select("id_a", "id_b", "sim")
    )
