"""EP4 broadcast-model pandas-UDF alignment (operators/alignment.py):
distributed offset rewrite must match a local numpy application bit-exactly,
and must run Arrow-vectorized (no row-at-a-time Python)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import audit

from geotreehealth_spark import synth
from geotreehealth_spark.operators.alignment import LinearOffsetModel, align_points
from tests.conftest import SF_DIR

MODEL = LinearOffsetModel(
    coef=[[0.001, -0.25], [-0.0005, 0.125]],  # features: (dbh, crown_position)
    intercept=[0.75, -1.5],
)


def test_alignment_matches_numpy_oracle(spark):
    stems = synth.stems(spark, SF_DIR)
    out = align_points(
        stems, MODEL, feature_cols=["dbh", "crown_position"]
    ).select("stem_tag", "x", "y", "x_aligned", "y_aligned")
    got = {r.stem_tag: r for r in out.collect()}

    pdf = stems.select("stem_tag", "x", "y", "dbh", "crown_position").toPandas()
    X = np.column_stack([
        pdf["dbh"].to_numpy(np.float64),
        pdf["crown_position"].to_numpy(np.float64),
    ])
    d = MODEL.predict(X)
    assert len(got) == len(pdf)
    for i, tag in enumerate(pdf["stem_tag"]):
        r = got[tag]
        # same IEEE expression (x + (X @ coef.T + b)) on both sides -> exact
        assert r.x_aligned == pdf["x"].iloc[i] + d[i, 0]
        assert r.y_aligned == pdf["y"].iloc[i] + d[i, 1]


def test_alignment_is_arrow_vectorized(spark):
    stems = synth.stems(spark, SF_DIR)
    a = audit(align_points(stems, MODEL, feature_cols=["dbh", "crown_position"]))
    assert a["batch_eval_python"] == 0
    assert a["arrow_python"] >= 1
