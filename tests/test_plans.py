"""Physical-plan regression guard (tools/plan_audit.py): the scale
invariants — no row-at-a-time Python anywhere, no cartesian blowups outside
documented bounded fallbacks, whole-stage codegen on JVM-side plans."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entry
from plan_audit import audit
from tests.conftest import SF_DIR

# pure-Catalyst queries: zero Python of any kind, codegen present
PURE_JVM = [
    "tpch_q1", "tile_assign", "boundary_filter", "dedup_keep_max_dbh",
    "keep_latest_year", "recode_counts", "class_rebalance", "factorize",
    "median_pick", "zonal_lidar", "zonal_percentiles", "overlap_pairs",
    "band_ops", "topk_orders", "dedup_exact", "fingerprint", "text_stats",
    "token_count", "lang_id", "jaccard_pairs", "ngram_jaccard_pairs",
    "minhash_lsh_pairs", "simhash_pairs", "stratified_split", "ann_ivf_topk",
    "group_first", "distinct_count", "drop_smallest", "pair_distances",
]
# Arrow-vectorized queries: pandas UDF / mapInPandas allowed, row-Python not.
# kNN-family and similarity queries carry documented bounded fallback branches
# (crossJoin on a proven-tiny residue / scalar broadcast joins), so the
# cartesian count is not asserted for them.
NO_CARTESIAN = PURE_JVM + [
    "pip_stems_plots", "pip_assign_best", "zonal_raster", "polygonize",
    "geometric_union", "explode_multi", "docs_decode_stems",
    "zonal_lidar_docs", "nms_greedy", "weighted_nms",
]


@pytest.fixture(scope="module")
def audits(spark):
    qs = entry.queries()
    names = sorted(set(PURE_JVM + NO_CARTESIAN))
    # execute=True: AQE only emits "codegen id :" markers on the finalized
    # plan, so the codegen assertion needs each query run once (sf0.001).
    return {n: audit(qs[n](spark, SF_DIR), execute=(n in PURE_JVM)) for n in names}


def test_no_row_python_anywhere(spark):
    qs = entry.queries()
    offenders = []
    for name, fn in qs.items():
        a = audit(fn(spark, SF_DIR))
        if a["batch_eval_python"]:
            offenders.append(name)
    assert offenders == [], f"row-at-a-time Python UDFs in: {offenders}"


def test_pure_jvm_queries_have_no_python(audits):
    offenders = [n for n in PURE_JVM if audits[n]["arrow_python"] > 0]
    assert offenders == [], f"unexpected Python stages in: {offenders}"


def test_no_cartesian_products(audits):
    offenders = [n for n in NO_CARTESIAN if audits[n]["cartesian"] > 0]
    assert offenders == [], f"cartesian/nested-loop joins in: {offenders}"


def test_codegen_present(audits):
    offenders = [n for n in PURE_JVM if audits[n]["codegen_spans"] == 0]
    assert offenders == [], f"no WholeStageCodegen span in: {offenders}"
