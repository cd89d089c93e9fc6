"""Document deduplication operators.

- exact_dedup: md5-hash groupBy, keep min id per group (one shuffle).
- jaccard_pairs: exact word-set Jaccard over an inverted-index join — the
  classic explode → token-join → |A∩B| / (|A|+|B|-|A∩B|) plan. Scales as the
  sum of squared posting-list lengths; stop-token removal (df cap) bounds the
  hot lists.
- minhash_signatures / minhash_lsh_pairs: n-permutation MinHash over word
  tokens with banding; candidate pairs join on (band, band-hash) buckets.
  Hashing is integer arithmetic on a stable 64-bit token hash (xxhash-free,
  crc-free — pure Python-side constants, computed in a vectorized pandas UDF).
- simhash64: 64-bit SimHash from the same token hashes (majority bit vote).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE = (1 << 61) - 1


def _token_hash64(tokens: pd.Series) -> np.ndarray:
    """Stable 64-bit FNV-1a over utf-8 token bytes, vectorized per batch."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def tokens_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, token) pairs, whitespace tokenization, lowercased."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, n_docs, keeper_id)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with word-set Jaccard >= threshold.

    max_df: drop tokens appearing in more than max_df docs (stop-token cap) —
    the standard trick that keeps the inverted-index self-join near-linear.
    """
    toks = tokens_df(docs, id_col, text_col)
    if max_df is not None:
        hot = toks.groupBy("token").count().where(F.col("count") > max_df).select("token")
        toks = toks.join(F.broadcast(hot), "token", "left_anti")
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("__sz"))
    a = toks.select(F.col(id_col).alias("id_a"), "token")
    b = toks.select(F.col(id_col).alias("id_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sz", "__sa"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sz", "__sb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__sa") + F.col("__sb") - F.col("__inter")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "jaccard")


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) for h_i(x) = (a_i * x + b_i) mod p."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, MERSENNE - 1, n_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE - 1, n_perm, dtype=np.int64)
    return a, b


def make_minhash_udf(n_perm: int = 64):
    a, b = _perm_params(n_perm)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        out = []
        av = a.astype(np.uint64)
        bv = b.astype(np.uint64)
        for t in texts:
            toks = pd.Series(list({w for w in t.lower().split() if w}))
            if len(toks) == 0:
                out.append([0] * n_perm)
                continue
            h = _token_hash64(toks) % np.uint64(MERSENNE)
            # (n_perm, n_tok) — mult mod 2^64 then mod mersenne is fine for
            # LSH bucketing purposes (deterministic, well-mixed)
            sig = (av[:, None] * h[None, :] + bv[:, None]) % np.uint64(MERSENNE)
            out.append(sig.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash_udf


def minhash_signatures(
    docs: DataFrame, n_perm: int = 64, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    udf = make_minhash_udf(n_perm)
    return docs.select(F.col(id_col), udf(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH on MinHash signatures.

    rows_per_band = n_perm // bands; a pair is a candidate if any band's
    sub-signature matches exactly — the shuffle key is (band_idx, band_hash),
    so collisions drive the join, never the cross product.
    """
    rows = n_perm // bands
    # materialize signatures before banding: the band expressions index the
    # signature array n_perm times and Catalyst would otherwise inline (and
    # re-run) the MinHash UDF once per extraction
    sigs = minhash_signatures(docs, n_perm, id_col, text_col).localCheckpoint(eager=True)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(",", *[F.col("signature")[i] for i in range(bi * rows, (bi + 1) * rows)])
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def make_simhash_udf():
    @F.pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        bitcols = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = pd.Series(list({w for w in t.lower().split() if w}))
            if len(toks) == 0:
                out[i] = 0
                continue
            h = _token_hash64(toks)
            bits = (h[:, None] & bitcols[None, :]) != 0
            votes = bits.sum(axis=0) * 2 - len(toks)
            pos = bitcols[votes > 0]
            sh = np.bitwise_or.reduce(pos) if len(pos) else np.uint64(0)
            out[i] = np.uint64(sh).astype(np.int64)
        return pd.Series(out)

    return simhash_udf


def simhash_dedup_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Blocked by 4x16-bit chunks (pigeonhole: <=3 differing bits → at least one
    of 4 chunks identical) so the join is on chunk equality, then the exact
    Hamming refine runs as a JVM expression (bit_count).
    """
    sh = docs.select(F.col(id_col), make_simhash_udf()(F.col(text_col)).alias("simhash"))
    chunks = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[F.shiftrightunsigned(F.col("simhash"), k * 16).bitwiseAND(F.lit(0xFFFF)) for k in range(4)])
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk_idx", "chunk")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk_idx", "chunk")
    pairs = (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs.select("id_a", "id_b", "hamming")
