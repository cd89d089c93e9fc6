"""IVF coarse-quantizer training (similarity.train_ivf_centroids).

r4 VERDICT "What's missing" 4: the IVF seam documented that production
trains its lists with k-means. This trains spherical k-means distributedly
on the sf0.01 embeddings fixture and checks (a) the trainer's invariants
(shape, unit norm) and (b) the point of training: recall@k of
ann_ivf_topk against the exact cosine top-k is at least as good with
trained centroids as with the seeded random draw, at the same
n_lists/nprobe budget. The ORACLE-gated query keeps the seeded literals
(deterministic plan == SQL oracle); this pytest gates the trained path.
"""

import numpy as np
from pyspark.sql import functions as F

from geotreehealth_spark import synth
from geotreehealth_spark.text import similarity

SF_DIR = "/root/testdata/sf0.01"


def _recall(ann_df, exact_df) -> float:
    ann = {(r.probe_id, r.neighbor_id) for r in ann_df.collect()}
    exact = {(r.probe_id, r.neighbor_id) for r in exact_df.collect()}
    return len(ann & exact) / len(exact)


def test_trained_centroids_beat_seeded_recall(spark):
    synth.register_tpch_views(spark, SF_DIR)
    emb = spark.table("embeddings")
    probes = emb.where(F.col("vec_id") % 25 == 0)

    trained = similarity.train_ivf_centroids(emb, dim=64, n_lists=16, iters=5)
    assert trained.shape == (16, 64)
    np.testing.assert_allclose(np.linalg.norm(trained, axis=1), 1.0, atol=1e-9)
    seeded = similarity.ivf_centroids(64, 16)
    assert not np.allclose(trained, seeded), "training did not move centroids"

    exact = similarity.cosine_topk(emb, probes, k=10)
    kw = dict(k=10, dim=64, n_lists=16, nprobe=4)
    r_seeded = _recall(similarity.ann_ivf_topk(emb, probes, **kw), exact)
    r_trained = _recall(
        similarity.ann_ivf_topk(emb, probes, centroids=trained, **kw), exact
    )
    # k-means concentrates neighborhoods into lists; at the same probe
    # budget the trained quantizer must not lose recall vs the random draw.
    # 2pp slack: the trainer's float sums depend on partition association
    # order, so a borderline vector can flip lists between environments —
    # without the slack this gate is flaky on unchanged code
    assert r_trained >= r_seeded - 0.02, (r_trained, r_seeded)
    assert r_trained > 0.5, r_trained
