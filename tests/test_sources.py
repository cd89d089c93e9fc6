"""Directory scans with schema contracts (S2/S3): drifting per-file schemas
unify under one typed contract, mirroring the reference's defensive renames."""

from geotreehealth_spark import sources


def test_parquet_dir_scan_with_drift(spark, tmp_path):
    base = tmp_path / "tiles"
    a = spark.createDataFrame([(1, "A", 2.0)], "StemTag int, status string, DBH double")
    b = spark.createDataFrame([(2, "D")], "StemTag int, status string")  # no DBH
    a.write.parquet(str(base / "t1"))
    b.write.parquet(str(base / "t2"))

    out = sources.scan_parquet(
        spark,
        str(base / "*"),
        renames={"status": "Status"},
        schema={"StemTag": "string", "Status": "string", "DBH": "double"},
    )
    rows = {r.StemTag: r for r in out.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"].Status == "A" and rows["1"].DBH == 2.0
    assert rows["2"].DBH is None  # file without the column → null via merge
    assert dict(out.dtypes) == {"StemTag": "string", "Status": "string", "DBH": "double"}


def test_csv_scan_contract(spark, tmp_path):
    p = tmp_path / "labels"
    p.mkdir()
    (p / "0.csv").write_text("StemTag,DBH\n7,1.5\n")
    (p / "1.csv").write_text("StemTag,DBH\n8,2.5\n")
    out = sources.scan_csv(
        spark, str(p / "*.csv"), schema={"StemTag": "int", "DBH": "double"}
    )
    got = sorted((r.StemTag, r.DBH) for r in out.collect())
    assert got == [(7, 1.5), (8, 2.5)]
