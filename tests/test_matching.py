"""J7 random_k_sample: the scale plan must equal the direct plan exactly.

The operator cost-switches between a direct window-rank over the enumerated
product and a hash-threshold prefilter + escalate-on-shortfall plan
(matching.py random_k_sample). Both are defined to return the SAME rows —
the k smallest draw hashes per probe, ties by right_id — so this forces each
path on the same input and asserts byte-identical sorted output, including
an oversample=1 run where ~half the probes fall short of k survivors in
round 1 and the escalation loop actually executes.
"""

from pyspark.sql import functions as F

from geotreehealth_spark.operators import matching


def _inputs(spark):
    left = spark.range(60).select(
        F.concat(F.lit("p"), F.col("id")).alias("pid"),
        F.col("id").alias("lkey"),
    )
    right = spark.range(400).select(
        F.concat(F.lit("c"), F.col("id")).alias("cid"),
        F.col("id").alias("rkey"),
    )
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_threshold_path_equals_direct(spark):
    left, right = _inputs(spark)
    kw = dict(k=7, left_id="pid", right_id="cid", left_key="lkey",
              right_key="rkey")
    direct = _rows(matching.random_k_sample(
        left, right, direct_max_pairs=10**9, **kw))
    assert len(direct) == 60 * 7
    thresh = _rows(matching.random_k_sample(
        left, right, direct_max_pairs=0, **kw))
    assert thresh == direct
    # oversample=1: expected survivors per probe == k, so shortfall probes
    # exist with near-certainty and the escalation re-scan runs
    tight = _rows(matching.random_k_sample(
        left, right, direct_max_pairs=0, oversample=1, **kw))
    assert tight == direct


def test_threshold_path_self_exclusion_and_small_pool(spark):
    # candidate pool smaller than k: every probe returns all (non-self)
    # candidates, both paths
    left = spark.range(30).select(
        F.concat(F.lit("p"), F.col("id")).alias("pid"),
        F.col("id").alias("lkey"),
        F.col("id").alias("self_rk"),
    )
    right = spark.range(4).select(
        F.concat(F.lit("c"), F.col("id")).alias("cid"),
        F.col("id").alias("rkey"),
    )
    kw = dict(k=9, left_id="pid", right_id="cid", left_key="lkey",
              right_key="rkey", self_key="self_rk")
    direct = _rows(matching.random_k_sample(
        left, right, direct_max_pairs=10**9, **kw))
    thresh = _rows(matching.random_k_sample(
        left, right, direct_max_pairs=0, **kw))
    assert thresh == direct
    # probes 0-3 exclude their self candidate (3 rows), probes 4+ get all 4
    per_probe = {}
    for pid, _, _ in direct:
        per_probe[pid] = per_probe.get(pid, 0) + 1
    assert all(n in (3, 4) for n in per_probe.values())
    assert len(per_probe) == 30
