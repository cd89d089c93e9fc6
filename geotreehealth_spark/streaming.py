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


def running_source_stats(
    docs: DataFrame,
    key_col: str = "source",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the brief's tool
    for semantics the built-in streaming aggregates can't express): per
    source, a RUNNING (n_docs, total_chars) total maintained in explicit
    group state across micro-batches AND restarts (state lives in the
    checkpoint). Emits one updated row per key per micro-batch as an
    append-mode operator (the exactly-once file sink works and checkpoint
    recovery is supported; the memory sink cannot recover) — the incremental
    corpus-accounting feed a 100-TB ingest pipeline tails; readers take the
    max-n_docs row per key for current totals.

    Built-in windowed aggregation can't express "running total since
    genesis, one emission per batch"; update-mode groupBy.count re-emits
    totals but cannot attach custom per-key logic (e.g. the char sums here,
    or any future quota/alarm logic) — hence the explicit-state form.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, n_docs long, total_chars long"
    state_schema = "n long, chars long"

    def update(key, pdfs, state: GroupState):
        n, chars = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            chars += int(pdf[chars_col].sum())
        state.update((n, chars))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_docs": [n], "total_chars": [chars]}
        )

    return (
        docs.select(key_col, chars_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
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
