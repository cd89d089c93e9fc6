"""Decode typed entity views from the interleaved docs table.

docs → filter by meta routing span → project attr/geom/raster spans into typed
columns (SURVEY.md §1.3: "docs → explode(spans) → pivot by kind → typed
table"). Span access uses JVM-side array/struct expressions (F.filter /
element_at) — the only Python is the vectorized WKB decode.

The decoded views are the engine's working tables; parity with the original
synth derivations is asserted in tests/test_docs.py (exact row equality), and
span-sequence equality of a rebuilt doc vs its input is asserted via
spans.doc_fingerprint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from geotreehealth_spark.geo import wkb


@F.pandas_udf(ArrayType(DoubleType()))
def point_xy_udf(geom: pd.Series) -> pd.Series:
    xs, ys = wkb.decode_points(list(geom))
    return pd.Series(np.stack([xs, ys], axis=1).tolist())


def _span_of_kind(kind: str):
    """First span of the given kind (JVM expression, no shuffle)."""
    return F.element_at(F.filter("spans", lambda s: s.kind == F.lit(kind)), 1)


def _meta_table():
    return F.regexp_extract(_span_of_kind("meta").text, r"table=([a-z]+);", 1)


def decode_stems(docs: DataFrame) -> DataFrame:
    """docs → stems view (stem_tag, x, y, dbh, year, status, crown_position,
    fad, site_id)."""
    d = docs.where(_meta_table() == "stems")
    attr = F.split(_span_of_kind("attr").text, ",")
    geom = F.unhex(_span_of_kind("geom").media_ref)
    d = d.select(
        attr.getItem(0).alias("stem_tag"),
        attr.getItem(1).cast("double").alias("dbh"),
        attr.getItem(2).cast("int").alias("year"),
        attr.getItem(3).alias("status"),
        attr.getItem(4).cast("int").alias("crown_position"),
        F.when(attr.getItem(5) == "", None).otherwise(attr.getItem(5)).alias("fad"),
        F.regexp_extract(_span_of_kind("meta").text, r"site=(.+)$", 1).alias("site_id"),
        point_xy_udf(geom).alias("__xy"),
    )
    return (
        d.withColumn("x", F.col("__xy")[0]).withColumn("y", F.col("__xy")[1]).drop("__xy")
    )


def decode_crowns(docs: DataFrame) -> DataFrame:
    """docs → crowns view with polygon WKB + bounds columns."""
    from geotreehealth_spark.docs.generator import ring_bounds_udf

    d = docs.where(_meta_table() == "crowns")
    attr = F.split(_span_of_kind("attr").text, ",")
    d = d.select(
        attr.getItem(0).alias("crown_id"),
        attr.getItem(1).cast("double").alias("score"),
        F.when(attr.getItem(2) == "", None).otherwise(attr.getItem(2)).alias("stem_tag"),
        attr.getItem(3).cast("boolean").alias("selected"),
        F.unhex(_span_of_kind("geom").media_ref).alias("geometry_wkb"),
    )
    d = d.withColumn("__b", ring_bounds_udf(F.col("geometry_wkb")))
    return (
        d.withColumn("gxmin", F.col("__b")[0])
        .withColumn("gymin", F.col("__b")[1])
        .withColumn("gxmax", F.col("__b")[2])
        .withColumn("gymax", F.col("__b")[3])
        .drop("__b")
    )


def decode_tiles(docs: DataFrame) -> DataFrame:
    """docs → tile manifest with raster media_ref + parsed raster meta."""
    d = docs.where(_meta_table() == "tiles")
    attr = F.split(_span_of_kind("attr").text, ",")
    raster = _span_of_kind("raster")
    return d.select(
        attr.getItem(0).alias("tile_id"),
        attr.getItem(1).cast("double").alias("txmin"),
        attr.getItem(2).cast("double").alias("tymin"),
        attr.getItem(3).cast("double").alias("txmax"),
        attr.getItem(4).cast("double").alias("tymax"),
        raster.media_ref.alias("media_ref"),
        F.regexp_extract(raster.text, r"bands=(\d+)", 1).cast("int").alias("bands"),
        F.regexp_extract(raster.text, r"h=(\d+)", 1).cast("int").alias("height"),
        F.regexp_extract(raster.text, r"w=(\d+)", 1).cast("int").alias("width"),
    )

def decode_lidar(docs: DataFrame) -> DataFrame:
    """docs → LiDAR tile manifest with laz:// media_ref + point count, ready
    for media.load_lidar_points (S6 scan path)."""
    d = docs.where(_meta_table() == "lidar")
    attr = F.split(_span_of_kind("attr").text, ",")
    span = _span_of_kind("lidar")
    return d.select(
        attr.getItem(0).alias("tile_id"),
        attr.getItem(1).cast("double").alias("txmin"),
        attr.getItem(2).cast("double").alias("tymin"),
        attr.getItem(3).cast("double").alias("txmax"),
        attr.getItem(4).cast("double").alias("tymax"),
        span.media_ref.alias("media_ref"),
        F.regexp_extract(span.text, r"n=(\d+)", 1).cast("int").alias("n_points"),
    )
