"""Text/dedup/similarity operators: numpy-oracle parity for the LSH family."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from geotreehealth_spark.text import dedup as tdedup
from geotreehealth_spark.text import similarity
from geotreehealth_spark.text.dedup import MERSENNE, _perm_params, _token_hash64
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def py_minhash(text: str, n_perm: int) -> list[int]:
    a, b = _perm_params(n_perm)
    toks = pd.Series(list({w for w in text.lower().split() if w}))
    h = _token_hash64(toks) % np.uint64(MERSENNE)
    sig = (a.astype(np.uint64)[:, None] * h[None, :] + b.astype(np.uint64)[:, None]) % np.uint64(
        MERSENNE
    )
    return sig.min(axis=1).astype(np.int64).tolist()


def test_minhash_matches_oracle_and_estimates_jaccard(spark, docs):
    sigs = tdedup.minhash_signatures(docs.limit(50), n_perm=64).toPandas()
    texts = docs.limit(50).toPandas().set_index("doc_id").text
    for row in sigs.itertuples():
        assert list(row.signature) == py_minhash(texts[row.doc_id], 64)
    # signature agreement ~ true word-set jaccard
    t = texts.iloc[0], texts.iloc[1]
    s0, s1 = py_minhash(t[0], 64), py_minhash(t[1], 64)
    est = np.mean(np.array(s0) == np.array(s1))
    a, b = set(t[0].lower().split()), set(t[1].lower().split())
    true_j = len(a & b) / len(a | b)
    assert abs(est - true_j) < 0.25


def test_minhash_lsh_recall(spark, docs):
    """LSH candidates must contain every pair above the band threshold."""
    pairs = tdedup.minhash_lsh_pairs(docs, n_perm=64, bands=16).toPandas()
    cand = set(zip(pairs.id_a, pairs.id_b))
    exact = tdedup.jaccard_pairs(docs, threshold=0.9).toPandas()
    for ia, ib in zip(exact.id_a, exact.id_b):
        assert (ia, ib) in cand, f"high-jaccard pair ({ia},{ib}) missed by LSH"


def test_simhash_hamming_reflects_similarity(spark, docs):
    sh = docs.limit(100).select(
        "doc_id", tdedup.make_simhash_udf()(F.col("text")).alias("simhash")
    ).toPandas()
    assert sh.simhash.nunique() > 90  # near-unique for distinct word-soup docs
    # identical text → identical simhash
    two = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id int, text string",
    )
    out = tdedup.simhash_dedup_pairs(two, max_hamming=0).toPandas()
    assert len(out) == 1 and out.hamming[0] == 0


def test_cosine_topk_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 3)
    got = similarity.cosine_topk(emb, probes, k=5).toPandas()
    pdf = emb.toPandas()
    M = np.asarray(pdf.embedding.tolist(), dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    for p in range(3):
        sims = Mn @ Mn[list(ids).index(p)]
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != p], key=lambda t: (-t[0], t[1])
        )[:5]
        expect = [i for _, i in order]
        mine = got[got.probe_id == p].sort_values("rank").neighbor_id.tolist()
        assert mine == expect
