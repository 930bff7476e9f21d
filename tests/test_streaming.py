"""Structured Streaming: windowed mention counts + incremental ingest
with exactly-once resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from pelinker_spark.mentions import generate_mentions
from pelinker_spark.streaming import (
    run_incremental_link,
    stream_pages,
    streaming_mention_counts,
)
from pelinker_spark.synth import web_pages


def test_streaming_mention_counts(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    web_pages(spark, 300, seed=42, n_entities=30, partitions=4).write.parquet(pages_dir)

    stream = stream_pages(spark, pages_dir, max_files_per_trigger=2)
    counts = streaming_mention_counts(stream, window="1 day", watermark="1 day")
    q = (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = spark.sql("select sum(n_mentions) as n from mention_counts").collect()[0]["n"]

    # batch ground truth: identical plan over the same files
    pages = spark.read.parquet(pages_dir)
    expect = generate_mentions(pages, (1, 2, 3), "en").count()
    assert got == expect


def test_incremental_link_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck2")
    web_pages(spark, 200, seed=42, n_entities=20, partitions=4).write.parquet(pages_dir)

    run_incremental_link(spark, pages_dir, out, ck)
    n1 = spark.read.parquet(f"{out}/mentions").count()
    assert n1 > 0

    # resume with no new files: checkpoint must prevent reprocessing
    run_incremental_link(spark, pages_dir, out, ck)
    n2 = spark.read.parquet(f"{out}/mentions").count()
    assert n2 == n1

    # new files arrive: only the delta is processed
    web_pages(spark, 100, seed=99, n_entities=20, partitions=2).write.mode(
        "append"
    ).parquet(pages_dir)
    run_incremental_link(spark, pages_dir, out, ck)
    n3 = spark.read.parquet(f"{out}/mentions").count()
    assert n3 > n2


def test_streaming_first_seen_stateful(spark, tmp_path):
    """applyInPandasWithState: a key is emitted exactly once across
    micro-batches AND across query restarts (state-store resume)."""
    from pelinker_spark.streaming import streaming_first_seen

    pages_dir = tmp_path / "pages_fs"
    pages_dir.mkdir()
    ck = str(tmp_path / "ck_fs")

    def run_once(qname):
        stream = stream_pages(spark, str(pages_dir), max_files_per_trigger=2)
        mentions = generate_mentions(
            stream.select("url", "warc_ts", "text", "lang"),
            (1, 2, 3), "en", extra_cols=("warc_ts",),
        )
        q = (
            streaming_first_seen(mentions)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out_fs"))
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    # batch 1
    web_pages(spark, 120, seed=42, n_entities=20, partitions=2).write.mode(
        "append"
    ).parquet(str(pages_dir))
    run_once("fs1")
    out1 = spark.read.parquet(str(tmp_path / "out_fs"))
    n1 = out1.count()
    assert n1 == out1.select("key").distinct().count()  # unique keys only

    # batch 2: same seed prefix → heavy key overlap, plus genuinely new
    # pages; a RESTARTED query must emit only the never-seen keys
    web_pages(spark, 240, seed=42, n_entities=20, partitions=2).write.mode(
        "append"
    ).parquet(str(pages_dir))
    run_once("fs2")
    out2 = spark.read.parquet(str(tmp_path / "out_fs"))
    assert out2.count() == out2.select("key").distinct().count()  # still unique

    # every key ever seen appears exactly once, and equals the batch truth
    pages = spark.read.parquet(str(pages_dir))
    expect_keys = (
        generate_mentions(pages, (1, 2, 3), "en").select("key").distinct().count()
    )
    assert out2.count() == expect_keys
