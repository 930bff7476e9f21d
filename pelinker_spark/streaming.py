"""Structured Streaming ingest for the record-linkage pipeline.

The reference has no streaming engine — it streams disk batches with
bounded memory and resumable checkpoints (pelinker/embedder.py:149-240,
model_selection_checkpoint.py; SURVEY.md §2.10). At web scale the same
need (continuously arriving WARC drops, resume-on-crash) maps directly to
Structured Streaming:

- `stream_pages` — file-source readStream over the pages table directory
  (new parquet files = new crawl drops).
- `streaming_mention_counts` — event-time windowed counts of blocking keys
  with a watermark for late pages: the incremental surface-statistics
  feed. Pure column algebra (generate_mentions) runs unchanged on the
  streaming DataFrame — the same declarative plan, micro-batched.
- `run_incremental_link` — foreachBatch incremental linking: each
  micro-batch extracts mentions and appends to the mention table; the
  blocking/scoring/CC stages run as periodic batch jobs over the
  accumulated table (the standard lambda-architecture split for
  iterative algorithms that can't run inside a streaming query).

Checkpointing: Spark's own streaming checkpoint (offsets + sink state)
gives exactly-once file-source processing — the streaming analog of the
reference's completed-set resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mentions import generate_mentions
from .synth import PAGE_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def streaming_mention_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    lang: str | None = "en",
) -> DataFrame:
    """Event-time (warc_ts) windowed mention-mass per blocking key with a
    late-data watermark — the streaming form of surface_table."""
    mentions = generate_mentions(
        pages_stream.select("url", "warc_ts", "text", "lang").withWatermark(
            "warc_ts", watermark
        ),
        (1, 2, 3),
        lang,
        extra_cols=("warc_ts",),
    )
    return mentions.groupBy(
        F.window("warc_ts", window).alias("w"), "wg", "key"
    ).agg(F.count("*").alias("n_mentions"))


def streaming_first_seen(
    mentions_stream: DataFrame,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): emit each
    blocking key exactly once — on the micro-batch where it is first seen
    — with its earliest event time and first-batch mention mass.

    This is the streaming analog of the surface table's "new vocabulary"
    feed: downstream incremental blocking only needs keys it has never
    scored before. State per key is a single seen-flag; Spark's state
    store checkpoints it, so a restarted query continues deduplicating
    across restarts (tested). Late rows for an already-emitted key are
    absorbed silently (state exists → no output)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "key string, first_seen timestamp, n_first_batch long"
    )
    state_schema = "seen boolean"

    def fn(key, pdfs, state: GroupState):
        n = 0
        first = None
        for pdf in pdfs:
            n += len(pdf)
            ts = pdf["warc_ts"].min()
            first = ts if first is None else min(first, ts)
        if state.exists:
            return iter([])
        state.update((True,))
        return iter(
            [
                pd.DataFrame(
                    {
                        "key": [key[0]],
                        "first_seen": [first],
                        "n_first_batch": [n],
                    }
                )
            ]
        )

    # operator output mode "append": every key row is emitted at most once
    # (first sight), so rows are immutable — composes with append sinks
    return mentions_stream.groupBy("key").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_incremental_link(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lang: str | None = "en",
) -> None:
    """foreachBatch ingestion: per micro-batch, extract mentions and append
    to the mention table (exactly-once via the streaming checkpoint).
    Blocking/scoring/CC then run as periodic batch jobs over out_dir —
    iterative CC cannot run inside a streaming query."""
    stream = stream_pages(spark, pages_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        m = generate_mentions(batch_df, (1, 2, 3), lang)
        m.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{out_dir}/mentions"
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
