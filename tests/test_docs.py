"""Interleaved-docs model: generate → decode roundtrip + span parity."""

import pyspark.sql.functions as F

from geotreehealth_spark import synth
from geotreehealth_spark.docs import decode, generator, spans
from tests.conftest import SF_DIR


def test_stems_roundtrip(spark):
    stems = synth.stems(spark, SF_DIR)
    docs = generator.stems_to_docs(stems)
    decoded = decode.decode_stems(docs)
    cols = ["stem_tag", "x", "y", "dbh", "year", "status", "crown_position", "fad", "site_id"]
    a = stems.select(cols).orderBy("stem_tag").toPandas()
    b = decoded.select(cols).orderBy("stem_tag").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_crowns_roundtrip_and_bounds(spark):
    # deterministic sample: limit() would pick different rows per evaluation
    # now that ingest repartitions round-robin (synth.register_tpch_views)
    crowns = synth.crowns(spark, SF_DIR).where(F.col("crown_key") % 37 == 0)
    geo = generator.crowns_with_geometry(crowns)
    docs = generator.crowns_to_docs(geo)
    decoded = decode.decode_crowns(docs)
    # ids and WKB bytes survive the hex roundtrip
    a = geo.select("crown_id", "geometry_wkb").orderBy("crown_id").toPandas()
    b = decoded.select("crown_id", "geometry_wkb").orderBy("crown_id").toPandas()
    assert list(a.crown_id) == list(b.crown_id)
    assert all(x == y for x, y in zip(a.geometry_wkb, b.geometry_wkb))
    # polygon bounds stay inside the generator's radius envelope
    chk = (
        geo.where(
            (F.col("gxmin") < F.col("cx") - F.col("radius") - 1e-9)
            | (F.col("gxmax") > F.col("cx") + F.col("radius") + 1e-9)
        ).count()
    )
    assert chk == 0


def test_tiles_roundtrip(spark):
    tiles = synth.tiles(spark)
    docs = generator.tiles_to_docs(tiles)
    decoded = decode.decode_tiles(docs)
    assert decoded.count() == 100
    row = decoded.where(F.col("tile_id") == "37").collect()[0]
    assert row.media_ref == "hsi://tile/37"
    assert (row.bands, row.height, row.width) == (12, 100, 100)
    assert row.txmin == 690.0 and row.tymin == 290.0


def test_span_parity_and_offsets(spark):
    stems = synth.stems(spark, SF_DIR)
    docs = generator.stems_to_docs(stems)
    # offsets are 0..n-1
    bad = docs.where(~spans.offsets_valid()).count()
    assert bad == 0
    # identical rebuild → zero mismatches; a mutated doc is caught
    rebuilt = generator.stems_to_docs(decodeless_identity(stems))
    res = spans.span_parity(docs, rebuilt)
    assert res == {"missing_left": 0, "missing_right": 0, "mismatched": 0}
    mutated = docs.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == "stem-1",
            F.transform(
                "spans",
                lambda s: F.struct(
                    s.kind.alias("kind"),
                    F.concat(s.text, F.lit("x")).alias("text"),
                    s.media_ref.alias("media_ref"),
                    s.offset.alias("offset"),
                ),
            ),
        ).otherwise(F.col("spans")),
    )
    res = spans.span_parity(docs, mutated)
    assert res["mismatched"] == 1


def decodeless_identity(stems):
    return stems


def test_lidar_docs_roundtrip(spark):
    """S6 media_ref path: tiles → lidar docs → decode → point-cloud load;
    deterministic across calls, coordinates within tile bounds, z
    milli-quantized in [0, 35)."""
    from geotreehealth_spark import media, synth
    from geotreehealth_spark.docs import decode, generator
    from tests.conftest import SF_DIR

    tiles = synth.tiles(spark, SF_DIR).where(F.col("tile_key") < 4)
    docs = generator.lidar_to_docs(tiles, n_points=50)
    manifest = decode.decode_lidar(docs)
    assert manifest.count() == 4
    pts = media.load_lidar_points(manifest).toPandas().sort_values("point_id")
    assert len(pts) == 200
    tb = tiles.toPandas().set_index("tile_id")
    for tid, g in pts.groupby("tile_id"):
        t = tb.loc[tid]
        assert ((g.x >= t.txmin) & (g.x < t.txmax)).all()
        assert ((g.y >= t.tymin) & (g.y < t.tymax)).all()
    assert ((pts.z >= 0) & (pts.z < 35)).all()
    # milli-quantized: z*1000 rounds to an integer within fp tolerance
    assert ((pts.z * 1000) - (pts.z * 1000).round()).abs().max() < 1e-9
    pts2 = media.load_lidar_points(manifest).toPandas().sort_values("point_id")
    assert (pts.reset_index(drop=True) == pts2.reset_index(drop=True)).all().all()
