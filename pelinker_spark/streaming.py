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


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check — shared fsio helper (os.path
    only sees the driver's local disk; on a real cluster the state dirs
    live on HDFS/S3, where a driver-local isdir is always False and would
    silently skip scoring or the seen-key anti-join)."""
    from .fsio import fs_exists

    return fs_exists(spark, path)


def _write_batch(
    df: DataFrame, path: str, batch_id: int,
    extra_partition_cols: tuple[str, ...] = (),
) -> None:
    """Idempotent per-batch append: partition by batch_id (plus any state
    bucketing columns) with dynamic partition overwrite, so a foreachBatch
    replay (streaming checkpoint not yet committed when the job died)
    rewrites its own partitions instead of duplicating rows — the parquet
    stand-in for an Iceberg idempotent append."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", *extra_partition_cols)
        .parquet(path)
    )


def incremental_link_batch(
    spark: SparkSession,
    new_keys: DataFrame,
    out_dir: str,
    cfg=None,
    batch_id: int = 0,
) -> None:
    """Score ONE micro-batch of never-seen surface keys against the
    accumulated key state (VERDICT r2 #6 — the consumer of the
    streaming_first_seen feed).

    Incremental blocking invariant: a candidate pair's LATER endpoint is
    new exactly once, so joining the new keys' bucket/compact rows against
    the accumulated state (old ∪ new) enumerates every pair at most once
    across all batches, and — because bucket ids depend only on the key
    string (blocking.lsh_buckets) — the union of per-batch pairs equals
    the batch-mode pair set (parity-tested). Deviations from batch mode,
    by construction of an append-only stream: (a) the LSH channel admits
    every key (lsh_min_mentions is a cross-batch property); (b) the
    hot-bucket cap applies to the ACCUMULATED bucket size at emission
    time — pairs already emitted before a bucket went hot stay.

    State layout under out_dir (all batch_id-partitioned, idempotent):
      buckets/       (key, band, bh)      — accumulated LSH membership
      bucket_counts/ (band, bh, n)        — per-batch count increments
      compact/       (key, ck, punct, wc) — accumulated compact forms
      group_counts/  (ck, n)              — per-batch count increments
      edges/         (key_a, key_b, jw, cos) — scored edges

    Per-batch cost model (the property that keeps a long-running stream
    from degrading): the hot caps aggregate the COUNT tables (per-batch
    increments, one row per distinct bucket/group touched — orders of
    magnitude smaller than membership); the membership history READ is
    pruned at the file source to the state prefixes this batch touched
    (buckets/ and compact/ are partitioned by pmod(xxhash64(bucket-id),
    cfg.state_prefixes) — _pruned_state); and the surviving rows are
    further pruned through a semi join on THIS batch's exact bucket ids
    before the pair join. Scan, shuffle and join are all proportional to
    the batch's blocking neighborhood, not to total accumulated state
    (receipts: tools/incremental_bench.py scanned-vs-history rows).
    """
    from .pipeline import LinkConfig, score_pairs

    cfg = cfg or LinkConfig()
    nk = new_keys.select("key").dropDuplicates(["key"]).persist()
    _write_incremental_state(nk, out_dir, cfg, batch_id)
    pairs = incremental_candidate_pairs(spark, out_dir, cfg, batch_id)
    edges = (
        score_pairs(pairs, cfg)
        .where(F.col("cos") >= cfg.cos_threshold)
        .select("key_a", "key_b", "jw", "cos")
    )
    _write_batch(edges, f"{out_dir}/edges", batch_id)
    nk.unpersist()


def _write_incremental_state(
    nk: DataFrame, out_dir: str, cfg, batch_id: int
) -> None:
    """Append this batch's bucket/compact membership AND the per-batch
    count increments (idempotent batch_id partitions — a replayed batch
    rewrites its own increments, so running totals never double-count).

    Membership tables carry a `pfx = pmod(xxhash64(bucket-id), K)` state
    partition column (K = cfg.state_prefixes): the read path pushes the
    batch's touched-prefix set into the history scan, so per-batch state
    reads prune at the file source instead of scanning all accumulated
    membership (VERDICT r3 #3 — the O(history)-per-batch scale-killer of
    a long-running stream). Count tables stay batch_id-only: they are
    orders of magnitude smaller (one row per distinct bucket touched) and
    are aggregated in full for the running caps."""
    from .blocking import compact_form, has_nonkey_chars, lsh_buckets

    k = int(getattr(cfg, "state_prefixes", 64))
    wc = F.size(F.split(F.col("key"), " "))
    nk_b = lsh_buckets(
        nk, "key", cfg.lsh_num_hashes, cfg.lsh_bands, cfg.lsh_rows
    ).withColumn("pfx", F.pmod(F.xxhash64("bh"), F.lit(k)))
    nk_c = nk.select(
        "key",
        compact_form(F.col("key")).alias("ck"),
        has_nonkey_chars(F.col("key")).alias("punct"),
        wc.alias("wc"),
    ).withColumn("pfx", F.pmod(F.xxhash64("ck"), F.lit(k)))
    _write_batch(nk_b, f"{out_dir}/buckets", batch_id, ("pfx",))
    _write_batch(
        nk_b.groupBy("band", "bh").agg(F.count("*").alias("n")),
        f"{out_dir}/bucket_counts",
        batch_id,
    )
    _write_batch(nk_c, f"{out_dir}/compact", batch_id, ("pfx",))
    _write_batch(
        nk_c.groupBy("ck").agg(F.count("*").alias("n")),
        f"{out_dir}/group_counts",
        batch_id,
    )


def _pruned_state(spark: SparkSession, path: str, batch_id: int) -> DataFrame:
    """Accumulated membership state restricted to the partitions (pfx
    dirs) the given batch touched. Two-phase: (1) partition-pruned scan of
    the batch's own rows to list its distinct pfx values (<= K ints on the
    driver); (2) re-scan with an isin() partition filter so Spark's file
    index skips every untouched prefix directory."""
    touched = [
        r["pfx"]
        for r in spark.read.parquet(path)
        .where(F.col("batch_id") == batch_id)
        .select("pfx")
        .distinct()
        .collect()
    ]
    return spark.read.parquet(path).where(F.col("pfx").isin(touched))


def incremental_candidate_pairs(
    spark: SparkSession, out_dir: str, cfg, batch_id: int
) -> DataFrame:
    """Candidate pairs for ONE batch of new keys against the accumulated
    state (state for `batch_id` must already be written). Shares every cap
    with the batch pipeline through LinkConfig — `max_block` for LSH
    buckets, `compact_max_block` for compact groups — so a single-batch
    run over a whole corpus enumerates exactly the batch pipeline's pair
    set at lsh_min_mentions=1 (parity-tested at default caps)."""
    from .pipeline import prefilter_pairs

    # File-source pruning of the accumulated membership (VERDICT r3 #3):
    # collect the batch's touched state prefixes (bounded by
    # cfg.state_prefixes — a driver list of <= K ints, never
    # data-proportional) and push them into the history read as a
    # partition-column filter. Only state files whose pfx directory can
    # pair with this batch are opened; a batch touching a narrow blocking
    # neighborhood reads a proportional slice of history rather than all
    # of it. The touched-set probe itself scans only the batch's own
    # batch_id partition (partition-pruned) for the pfx directory column.
    all_b = _pruned_state(spark, f"{out_dir}/buckets", batch_id)
    all_c = _pruned_state(spark, f"{out_dir}/compact", batch_id)

    # hot caps from the running-count tables: accumulated size at emission
    # time = sum of per-batch increments up to now
    ok_buckets = (
        spark.read.parquet(f"{out_dir}/bucket_counts")
        .groupBy("band", "bh")
        .agg(F.sum("n").alias("bn"))
        .where(F.col("bn") <= cfg.max_block)
        .select("band", "bh")
    )
    nb = all_b.where(F.col("batch_id") == batch_id).join(
        ok_buckets, ["band", "bh"], "left_semi"
    )
    # prune history to buckets this batch actually touched BEFORE the
    # pair join, so the full-history shuffle carries only joinable rows.
    # No broadcast hint: a "batch" can legitimately be a whole corpus
    # (single-drop runs, the parity test), making this set unbounded —
    # AQE broadcasts it when it is actually small
    ob = all_b.join(
        nb.select("band", "bh").dropDuplicates(), ["band", "bh"], "left_semi"
    )
    pairs_lsh = (
        nb.select("band", "bh", F.col("key").alias("k1"))
        .join(ob.select("band", "bh", F.col("key").alias("k2")), ["band", "bh"])
        .where(F.col("k1") != F.col("k2"))
        .select(
            F.least("k1", "k2").alias("key_a"),
            F.greatest("k1", "k2").alias("key_b"),
        )
        .where(
            F.size(F.split(F.col("key_a"), " "))
            == F.size(F.split(F.col("key_b"), " "))
        )
    )

    ok_groups = (
        spark.read.parquet(f"{out_dir}/group_counts")
        .groupBy("ck")
        .agg(F.sum("n").alias("gn"))
        .where(F.col("gn") <= cfg.compact_max_block)
        .select("ck")
    )
    ncp = all_c.where(F.col("batch_id") == batch_id).join(
        ok_groups, "ck", "left_semi"
    )
    ocp = all_c.join(ncp.select("ck").dropDuplicates(), "ck", "left_semi")
    pairs_c = (
        ncp.select("ck", F.col("key").alias("k1"), F.col("punct").alias("p1"),
                   F.col("wc").alias("w1"))
        .join(
            ocp.select("ck", F.col("key").alias("k2"),
                       F.col("punct").alias("p2"), F.col("wc").alias("w2")),
            "ck",
        )
        .where((F.col("k1") != F.col("k2")) & (F.col("p1") | F.col("p2")))
        .where(F.col("w1") == F.col("w2"))
        .select(
            F.least("k1", "k2").alias("key_a"),
            F.greatest("k1", "k2").alias("key_b"),
        )
    )

    return (
        prefilter_pairs(pairs_lsh.unionByName(pairs_c))
        .dropDuplicates(["key_a", "key_b"])
    )


def finalize_incremental_link(
    spark: SparkSession, out_dir: str, kb: DataFrame | None = None
) -> DataFrame:
    """Periodic batch step over the accumulated incremental state:
    connected components over ALL edges so far, joined back onto the
    accumulated mention table — the same cluster assignment as
    link_pipeline's (iterative CC cannot run inside a streaming query;
    SURVEY.md §2.10 lambda split)."""
    from .cc import connected_components

    if not _fs_exists(spark, f"{out_dir}/edges"):
        m = spark.read.parquet(f"{out_dir}/mentions")
        return m.withColumn("cluster_id", F.col("key"))
    edges = spark.read.parquet(f"{out_dir}/edges").dropDuplicates(
        ["key_a", "key_b"]
    )
    mentions = spark.read.parquet(f"{out_dir}/mentions")
    comp = connected_components(edges, "key_a", "key_b")
    return (
        mentions.join(comp, "key", "left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col("key")))
        .drop("component")
    )


def run_incremental_link(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lang: str | None = "en",
    cfg=None,
    max_files_per_trigger: int = 8,
    use_stateful_first_seen: bool = False,
) -> None:
    """Two CHAINED streaming queries, each with its own checkpoint
    (exactly-once file-source processing):

      1. mention ingest — per micro-batch, extract mentions ONCE and
         append to the mention table (idempotent batch_id partitions);
      2. incremental scoring — a file-source stream over the mention
         table itself (the standard multi-hop / medallion chain: the
         sink of query 1 is the source of query 2, so page text is
         parsed exactly once per page, not once per consumer). Each
         micro-batch's NEVER-SEEN surface keys are scored against the
         accumulated key state (incremental_link_batch) — batch 2 never
         re-scores batch 1's vocabulary.

    First-seen dedup has two implementations with identical semantics
    (a key scores exactly once, in the first batch where it appears;
    both survive restarts):

      - default: anti-join the batch's keys against the accumulated
        bucket state, strictly-older partitions only (`batch_id <
        current`, so an ingest-replay of the current partition stays
        idempotent). The on-disk state the scorer already maintains IS
        the seen-set — pure JVM column algebra, no second state store.
      - use_stateful_first_seen=True: route through
        streaming_first_seen (applyInPandasWithState). Same output;
        measured 40x slower end-to-end at 40k pages / 5 drops (1405s vs
        34.7s batch — per-KEY pandas groups put every mention row
        through a Python state call). Kept as the §2.10 stateful-
        operator showcase and for sinks that need the (key, first_seen,
        n_first_batch) feed itself.

    CC + cluster assignment then run as a periodic batch job
    (finalize_incremental_link)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        m = generate_mentions(batch_df, (1, 2, 3), lang, extra_cols=("warc_ts",))
        _write_batch(m, f"{out_dir}/mentions", batch_id)

    q1 = (
        stream_pages(spark, pages_dir, max_files_per_trigger)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", f"{checkpoint_dir}/ingest")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()

    if not _fs_exists(spark, f"{out_dir}/mentions"):
        return  # empty first drop: nothing ingested, nothing to score

    # schema of the mention table = generate_mentions' analyzed output
    # schema (no job runs for this) + the batch_id partition column
    mention_schema = generate_mentions(
        spark.createDataFrame([], PAGE_SCHEMA),
        (1, 2, 3),
        lang,
        extra_cols=("warc_ts",),
    ).schema.add("batch_id", "long")
    mention_stream = (
        spark.readStream.schema(mention_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{out_dir}/mentions")
    )

    if use_stateful_first_seen:

        def score_new(batch_df: DataFrame, batch_id: int) -> None:
            incremental_link_batch(spark, batch_df, out_dir, cfg, batch_id)

        source = streaming_first_seen(mention_stream)
    else:

        def score_new(batch_df: DataFrame, batch_id: int) -> None:
            nk = batch_df.select("key").dropDuplicates(["key"])
            if _fs_exists(spark, f"{out_dir}/buckets"):
                # every key has exactly ONE band-0 row, so the band filter
                # makes this a one-row-per-seen-key, key-column-pruned scan
                # (row-group stats prune the other bands) instead of a
                # bands-times-larger read per micro-batch
                seen = (
                    spark.read.parquet(f"{out_dir}/buckets")
                    .where(
                        (F.col("batch_id") < F.lit(batch_id))
                        & (F.col("band") == 0)
                    )
                    .select("key")
                )
                nk = nk.join(seen, "key", "left_anti")
            incremental_link_batch(spark, nk, out_dir, cfg, batch_id)

        source = mention_stream

    q2 = (
        source.writeStream.foreachBatch(score_new)
        .option("checkpointLocation", f"{checkpoint_dir}/score")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
