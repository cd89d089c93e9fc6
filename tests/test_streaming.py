"""Structured Streaming: checkpointed dedup resume + watermarked windows."""

import pyspark.sql.functions as F

from geotreehealth_spark import streaming

DOCS_SCHEMA = "doc_id string, text string, lang string, event_time timestamp"


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, event_time string"
    ).withColumn("event_time", F.to_timestamp("event_time"))
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    t = "2026-01-01 00:00:00"
    _write_batch(
        spark,
        src,
        [("a", "alpha", "en", t), ("b", "beta", "en", t), ("c", "alpha", "en", t)],
    )
    stream = streaming.stream_docs(spark, src, DOCS_SCHEMA)
    out = streaming.streaming_exact_dedup(stream)
    streaming.run_available_now(out, ckpt, sink_path=sink)
    first = spark.read.parquet(sink)
    assert first.count() == 2  # 'alpha' duplicate dropped within the batch

    # new files arrive; restart from the SAME checkpoint: already-seen text
    # must stay deduped across the restart (state recovered)
    _write_batch(
        spark, src, [("d", "alpha", "en", t), ("e", "gamma", "en", t)]
    )
    stream2 = streaming.stream_docs(spark, src, DOCS_SCHEMA)
    out2 = streaming.streaming_exact_dedup(stream2)
    streaming.run_available_now(out2, ckpt, sink_path=sink)
    final = spark.read.parquet(sink)
    assert final.count() == 3  # only 'gamma' is new
    assert sorted(r.text for r in final.collect()) == ["alpha", "beta", "gamma"]


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "in2")
    ckpt = str(tmp_path / "ckpt2")
    _write_batch(
        spark,
        src,
        [
            ("a", "x", "en", "2026-01-01 00:01:00"),
            ("b", "y", "en", "2026-01-01 00:04:00"),
            ("c", "z", "de", "2026-01-01 00:02:00"),
            ("d", "w", "en", "2026-01-01 00:12:00"),
        ],
    )
    stream = streaming.stream_docs(spark, src, DOCS_SCHEMA)
    out = streaming.windowed_doc_counts(stream, window="10 minutes")
    streaming.run_available_now(
        out, ckpt, memory_name="wincounts", output_mode="complete"
    )
    got = {
        (str(r.window_start), r.lang): r.n_docs
        for r in spark.table("wincounts").collect()
    }
    assert got[("2026-01-01 00:00:00", "en")] == 2
    assert got[("2026-01-01 00:00:00", "de")] == 1
    assert got[("2026-01-01 00:10:00", "en")] == 1


def test_running_source_stats_state_across_restart(spark, tmp_path):
    """applyInPandasWithState: running per-source totals must accumulate
    across micro-batches AND survive a restart from the same checkpoint."""
    src = str(tmp_path / "in3")
    ckpt = str(tmp_path / "ckpt3")
    schema = "doc_id string, text string, source string, n_chars long"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "out3")

    def totals():
        rows = spark.read.parquet(sink).collect()
        best = {}
        for r in rows:  # totals are monotone; latest emission = max n_docs
            cur = best.get(r.source)
            if cur is None or r.n_docs > cur[0]:
                best[r.source] = (r.n_docs, r.total_chars)
        return best

    write([("a", "x", "s0", 10), ("b", "y", "s0", 20), ("c", "z", "s1", 5)])
    out = streaming.running_source_stats(streaming.stream_docs(spark, src, schema))
    streaming.run_available_now(out, ckpt, sink_path=sink)
    assert totals() == {"s0": (2, 30), "s1": (1, 5)}

    # restart from the SAME checkpoint with new arrivals: totals continue
    # from recovered state, not from zero
    write([("d", "w", "s0", 7), ("e", "v", "s2", 3)])
    out2 = streaming.running_source_stats(streaming.stream_docs(spark, src, schema))
    streaming.run_available_now(out2, ckpt, sink_path=sink)
    got2 = totals()
    assert got2["s0"] == (3, 37)
    assert got2["s2"] == (1, 3)
