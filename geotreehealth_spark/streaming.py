"""Structured Streaming ingest (SURVEY.md §2.8 / north_star streaming path).

The reference is batch-only, so this module maps the engine's ingest-side
semantics onto Structured Streaming for continuously-arriving document
corpora: the same dedup and windowed-stats operators the batch layer has,
expressed as incremental queries with checkpointed state — the streaming
complement to lineage.py's batch-incremental resume.

- stream_docs: file-source stream over an interleaved-docs directory (new
  parquet files appear as micro-batches; at production scale the source is a
  Kafka/queue stream with the same schema).
- streaming_exact_dedup: keep first-seen text hash; dropDuplicates state is
  checkpointed, so a restarted job never re-emits an already-seen document.
- windowed_doc_counts: per-(window, lang) arrival counts with a watermark
  bounding late data — the canonical monitoring aggregate.
- run_available_now: drain everything currently in the source, then stop —
  deterministic incremental batches (Trigger.AvailableNow), the pattern for
  cron-style incremental ingest with exactly-once file sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_docs(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source document stream (schema must be explicit for streams)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """First-seen wins on the text hash; state lives in the checkpoint.

    Unbounded state by design (corpus dedup must remember everything);
    bound it with a watermark upstream when dedup-within-horizon suffices.
    """
    return docs.withColumn("text_hash", F.md5(F.col(text_col))).dropDuplicates(
        ["text_hash"]
    )


def windowed_doc_counts(
    docs: DataFrame,
    ts_col: str = "event_time",
    lang_col: str = "lang",
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """(window, lang, n_docs) with late arrivals beyond `watermark` dropped."""
    return (
        docs.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(lang_col))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(lang_col),
            F.col("n_docs"),
        )
    )


def run_available_now(
    out: DataFrame,
    checkpoint: str,
    sink_path: str | None = None,
    memory_name: str | None = None,
    output_mode: str = "append",
):
    """Drain the source once (AvailableNow) and block until done.

    sink_path → exactly-once parquet file sink; memory_name → in-memory table
    (tests/monitoring only). Returns the finished StreamingQuery.
    """
    w = out.writeStream.option("checkpointLocation", checkpoint).outputMode(output_mode)
    if sink_path is not None:
        q = w.trigger(availableNow=True).format("parquet").option("path", sink_path).start()
    else:
        q = w.trigger(availableNow=True).format("memory").queryName(memory_name).start()
    q.awaitTermination()
    return q
