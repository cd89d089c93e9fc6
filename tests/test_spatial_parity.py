"""Parity of distributed spatial operators vs sequential numpy oracles.

These cover the WKB-polygon paths that the SQL oracles can't express:
- filter-refine PIP join with irregular convex crowns (J3)
- greedy NMS vs the reference-order sequential oracle (W3) — including
  cross-cell borders (crowns straddle the 50 m cells by construction).
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from geotreehealth_spark import synth
from geotreehealth_spark.docs import generator
from geotreehealth_spark.geo import kernels, wkb
from geotreehealth_spark.operators import nms, pip_join
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def crowns_geo_pd(spark):
    crowns = synth.crowns(spark, SF_DIR)
    geo = generator.crowns_with_geometry(crowns)
    pdf = geo.select(
        "crown_id", "crown_key", "score", "geometry_wkb", "gxmin", "gymin", "gxmax", "gymax"
    ).toPandas()
    return pdf


def test_pip_polygon_parity(spark, crowns_geo_pd):
    stems = synth.stems(spark, SF_DIR)
    geo = spark.createDataFrame(crowns_geo_pd)
    got = (
        pip_join.pip_join(
            stems,
            geo,
            cell_size=25.0,
            poly_wkb="geometry_wkb",
            poly_bounds=("gxmin", "gymin", "gxmax", "gymax"),
        )
        .select("crown_id", "stem_tag")
        .toPandas()
    )
    got_pairs = set(zip(got.crown_id, got.stem_tag))

    stems_pd = stems.select("stem_tag", "x", "y").toPandas()
    px = stems_pd.x.to_numpy()
    py = stems_pd.y.to_numpy()
    tags = stems_pd.stem_tag.to_numpy()
    expected = set()
    for row in crowns_geo_pd.itertuples():
        # bbox prefilter then exact kernel — the oracle is the kernel itself
        m = (px >= row.gxmin) & (px < row.gxmax) & (py >= row.gymin) & (py < row.gymax)
        if not m.any():
            continue
        ring = wkb.decode_polygon(row.geometry_wkb)
        inside = kernels.points_in_polygon(px[m], py[m], ring)
        for t in tags[m][inside]:
            expected.add((row.crown_id, t))
    assert got_pairs == expected
    assert len(expected) > 100  # non-trivial fixture


def sequential_nms(pdf, threshold):
    """Reference-order greedy (get_polygons.py:798-816): score desc, id asc."""
    order = pdf.sort_values(["score", "crown_id"], ascending=[False, True])
    kept = []
    kept_rings = []
    kept_bounds = []
    selected = {}
    for row in order.itertuples():
        ring = wkb.decode_polygon(row.geometry_wkb)
        keep = True
        for kid, kring, kb in zip(kept, kept_rings, kept_bounds):
            if (
                row.gxmin < kb[2]
                and row.gxmax > kb[0]
                and row.gymin < kb[3]
                and row.gymax > kb[1]
            ):
                if kernels.polygon_overlap_ratio(ring, kring) > threshold:
                    keep = False
                    break
        selected[row.crown_id] = keep
        if keep:
            kept.append(row.crown_id)
            kept_rings.append(ring)
            kept_bounds.append((row.gxmin, row.gymin, row.gxmax, row.gymax))
    return selected


def test_greedy_nms_parity(spark, crowns_geo_pd):
    # subset dense enough for long suppression chains but tractable oracle
    pdf = crowns_geo_pd[crowns_geo_pd.gxmin < 200.0].reset_index(drop=True)
    assert len(pdf) > 1500
    expected = sequential_nms(pdf, threshold=0.3)

    geo = spark.createDataFrame(pdf)
    got = (
        nms.greedy_nms(
            geo,
            id_col="crown_id",
            score_col="score",
            threshold=0.3,
            cell_size=50.0,
            bounds=("gxmin", "gymin", "gxmax", "gymax"),
            wkb_col="geometry_wkb",
        )
        .select("crown_id", "selected")
        .toPandas()
    )
    got_map = dict(zip(got.crown_id, got.selected))
    assert len(got_map) == len(expected)
    diffs = {k for k in expected if bool(got_map[k]) != expected[k]}
    assert diffs == set(), f"{len(diffs)} NMS decisions differ, e.g. {list(diffs)[:5]}"
    # sanity: suppression actually happened
    n_suppressed = sum(1 for v in expected.values() if not v)
    assert n_suppressed > 50
