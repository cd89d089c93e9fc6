"""kNN edge cases (ADVICE.md round 2): empty candidate side must return an
empty result (not crash on NULL bounds), and repeated calls must not leak
persisted blocks in a long-lived session."""

import pyspark.sql.functions as F

from geotreehealth_spark.operators import knn


def _points(spark, rows, xcol="x", ycol="y", idcol="pid"):
    if not rows:
        return spark.createDataFrame([], f"{idcol} string, {xcol} double, {ycol} double")
    return spark.createDataFrame(rows, f"{idcol} string, {xcol} double, {ycol} double")


def test_knn_join_empty_right(spark):
    left = _points(spark, [("a", 1.0, 1.0), ("b", 5.0, 5.0)])
    right = _points(spark, [], xcol="cx", ycol="cy", idcol="cid")
    out = knn.knn_join(
        left, right, k=2, left_id="pid", right_id="cid", cell_size=10.0, extent=100.0
    )
    assert out.count() == 0
    assert {"pid", "cid", "dist", "knn_rank"} <= set(out.columns)


def test_quadrant_knn_join_empty_right(spark):
    left = _points(spark, [("a", 1.0, 1.0)])
    right = _points(spark, [], xcol="cx", ycol="cy", idcol="cid")
    out = knn.quadrant_knn_join(
        left, right, left_id="pid", right_id="cid", cell_size=10.0, extent=100.0,
        min_dist=0.0,
    )
    assert out.count() == 0
    assert "quadrant" in out.columns


def test_knn_join_no_cache_leak(spark):
    left = _points(spark, [(f"p{i}", float(i), float(i)) for i in range(50)])
    right = _points(
        spark,
        [(f"c{i}", float(i) + 0.25, float(i) - 0.25) for i in range(50)],
        xcol="cx", ycol="cy", idcol="cid",
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    out = knn.knn_join(
        left, right, k=3, left_id="pid", right_id="cid", cell_size=5.0, extent=60.0
    )
    assert out.count() == 50 * 3
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    # the returned localCheckpoint RDD is the only retained block set
    assert after <= before + 1


def test_exact_reach_proofs_match_conservative(spark, monkeypatch):
    """r6 exact-reach + empty-quadrant proof arms: proofs only decide which
    probes escalate, so the exact-reach path (which proves the corner probe's
    empty outward quadrants at ring 1) must produce byte-identical rows to
    the conservative pre-r6 path (which sends that probe through the
    escalation rare path). The fixture pins the failure mode that kept a
    1-probe residue at sf0.1: a probe AT the data min corner, whose west and
    south quadrants are empty but unbounded along one axis, plus a sparse far
    corner so escalation genuinely runs in the conservative variant."""
    left = _points(
        spark,
        [("corner", 0.0, 0.0), ("mid", 41.0, 43.0), ("edge", 0.0, 57.0)],
    )
    right = _points(
        spark,
        [(f"c{i}", (i * 37.0) % 90 + 5.0, (i * 53.0) % 90 + 5.0) for i in range(40)]
        + [("far", 99.0, 99.0)],
        xcol="cx", ycol="cy", idcol="cid",
    )
    rows = lambda df, cols: sorted(map(tuple, df.select(*cols).collect()))
    kw = dict(left_id="pid", right_id="cid", cell_size=8.0, extent=100.0)
    qcols = ("pid", "cid", "quadrant", "dist")
    cols = ("pid", "cid", "dist", "knn_rank")
    monkeypatch.delenv("SPARK_GRAFT_KNN_CONSERVATIVE_PROOF", raising=False)
    qa = rows(knn.quadrant_knn_join(left, right, min_dist=3.0, **kw), qcols)
    ka = rows(knn.knn_join(left, right, k=4, **kw), cols)
    monkeypatch.setenv("SPARK_GRAFT_KNN_CONSERVATIVE_PROOF", "1")
    qb = rows(knn.quadrant_knn_join(left, right, min_dist=3.0, **kw), qcols)
    kb = rows(knn.knn_join(left, right, k=4, **kw), cols)
    assert qa == qb and qa
    assert ka == kb and len(ka) == 3 * 4
    # the corner probe's NW/SW/SE quadrants are provably empty: its only
    # output rows are NE ones
    assert all(q == "NE" for p, _, q, _ in qa if p == "corner")


def test_empty_prologue_rings_exact(spark):
    """Rings that all exceed max_ring leave an empty prologue: every probe is
    residue and the escalation loop does all the work — same rows as the
    default path (review r5: this used to IndexError on pieces[0])."""
    left = _points(
        spark, [(f"p{i}", i * 37.0 % 100, i * 53.0 % 100) for i in range(20)]
    )
    right = _points(
        spark,
        [(f"c{i}", i * 17.0 % 100, i * 29.0 % 100) for i in range(50)],
        xcol="cx", ycol="cy", idcol="cid",
    )
    kw = dict(left_id="pid", right_id="cid", cell_size=50.0, extent=100.0)
    rows = lambda df, cols: sorted(map(tuple, df.select(*cols).collect()))
    cols = ("pid", "cid", "dist", "knn_rank")
    a = rows(knn.knn_join(left, right, k=3, prologue_rings=(9,), **kw), cols)
    b = rows(knn.knn_join(left, right, k=3, **kw), cols)
    assert a == b and len(a) == 60
    qcols = ("pid", "cid", "quadrant", "dist")
    qa = rows(
        knn.quadrant_knn_join(left, right, min_dist=0.0, prologue_rings=(9,), **kw),
        qcols,
    )
    qb = rows(knn.quadrant_knn_join(left, right, min_dist=0.0, **kw), qcols)
    assert qa == qb and qa
