"""Structured Streaming twins of the batch pipeline.

The reference ingests documents via an upload endpoint and triggers an
incremental rebuild (behavior: ai_worker.py:970-1055 → prebuild); the
streaming restatement is `readStream` over the landing path with
`foreachBatch` running exactly the batch stage transforms per micro-batch —
one code path for batch and stream.

* `stream_pages_to_triples` — file-source stream of pages parquet →
  extract+segment+extract-triples per micro-batch, appended to a triples
  sink; checkpointLocation gives exactly-once per-batch resume.
* `windowed_triple_counts` — tumbling-window counts with a watermark for
  late data (the per-window metrics rows of the north rule in streaming
  form).
* `sessionize_stream` — custom stateful operator via
  applyInPandasWithState: the streaming twin of operators/events.sessionize
  (gap-based sessions with per-user state and processing-time timeout).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from darkbo_spark.kg.extract import extract_docs
from darkbo_spark.kg.pages import PAGES_SCHEMA
from darkbo_spark.kg.triples import extract_doc_triples_df


def stream_pages_to_triples(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
):
    """File-source streaming ingest: each new parquet file of pages becomes
    a micro-batch run through the SAME batch transforms. Returns the
    StreamingQuery (caller awaits / stops).

    foreachBatch is at-least-once (a crash between the sink write and the
    offset commit replays the batch), so the write is made IDEMPOTENT:
    dynamic partition overwrite keyed by batch_id — a replayed batch
    rewrites its own partition instead of appending duplicates, which is
    the standard exactly-once-effect pattern for foreachBatch sinks.

    checkpoint_path and output_path share ONE lifetime: idempotence keys
    on batch_id, so resetting the checkpoint while keeping the output
    would restart batch_id at 0 and leave stale higher-numbered batch
    partitions mixed into downstream reads. A populated output with no
    checkpoint is therefore refused up front instead of silently
    corrupting."""
    import os

    if not os.path.exists(checkpoint_path) and any(
        e.startswith("batch_id=") for e in (
            os.listdir(output_path) if os.path.isdir(output_path) else []
        )
    ):
        raise ValueError(
            f"output_path {output_path!r} already holds batch_id partitions "
            f"but checkpoint_path {checkpoint_path!r} does not exist — "
            "batch_id numbering would restart at 0 and strand stale "
            "partitions; clear the output or restore its checkpoint"
        )
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_doc_triples_df(extract_docs(batch_df))
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_path)
        )

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts with late-data watermark (streaming DF in →
    streaming DF out; also works on a batch DF for testing the plan)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.window("ts", window).alias("win"), F.col("event_type")
    ).agg(F.count("*").alias("n"))


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of A5/exact_dedup:
    `dropDuplicatesWithinWatermark` keeps per-key state only for the
    watermark horizon, so state size is bounded by the duplicate-arrival
    window instead of the full stream history (the correct 100 TB/day
    shape; an unbounded dropDuplicates would OOM the state store).

    Streaming keeps the FIRST-ARRIVING row per key (inherent to the
    operator). The batch fallback keeps a deterministic row only when
    `tiebreak` is given (row_number over keys ordered by tiebreak);
    without it, plain dropDuplicates keeps an arbitrary row — only the key
    columns are deterministic."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    if tiebreak:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*keys).orderBy(*[F.asc(c) for c in tiebreak])
        return (
            events.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    return events.dropDuplicates(keys)


def stream_pages_to_linked_triples(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    entity_dict: DataFrame,
    link_strategy: str = "broadcast",
    max_files_per_trigger: int = 4,
):
    """Streaming twin of the FULL KG pipeline's per-page path: each
    micro-batch of landed pages runs extract → segment → triples → entity
    LINK (same batch transforms, same broadcast/salted strategies) and
    writes linked triples. The dictionary is batch-side (slowly-changing
    dimension joined per micro-batch — the standard stream-static join);
    canonicalization stays a batch concern because alias clusters are
    corpus-global. foreachBatch is at-least-once, so the sink is made
    idempotent per batch (dynamic partition overwrite keyed by batch_id):
    a crash-replayed batch rewrites its own partition — exactly-once
    EFFECT, no duplicates, no drops."""
    from darkbo_spark.kg.link import link_entities

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        # micro-batch size = the latency/throughput knob: small batches
        # cut landed-to-linked latency, big batches amortize per-batch
        # fixed costs toward batch-job throughput (measured sweep in
        # BENCH/BASELINE.md via scripts/bench_streaming.py)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        linked = link_entities(
            extract_doc_triples_df(extract_docs(batch_df)),
            entity_dict,
            strategy=link_strategy,
        )
        (
            linked.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_path)
        )

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_asof_candidates(
    spark: SparkSession,
    events_path: str,
    orders_path: str,
    out_path: str,
    checkpoint_path: str,
    horizon: str = "30 days",
    watermark: str = "1 hour",
):
    """Watermarked STREAM-STREAM interval join — the streaming leg of the
    as-of twin (batch form: operators/asof.as_of_join, driver-oracled as
    asof_events_orders).

    Structured Streaming cannot express "latest right row ≤ ts" in one
    operator, but the canonical decomposition is:

      1. stream-stream inner join on the key with the time-range predicate
         o_ts ∈ [ts - horizon, ts] — HERE. Watermarks on BOTH sides bound
         the join state: each side's rows are dropped from state once the
         other side's watermark passes ts + horizon, so state is
         O(arrival-rate × (watermark + horizon)), never the full history.
      2. the as-of reduction (argmax o_ts per event, same tie-break as
         as_of_join: latest date, then largest key) over the appended sink
         — `asof_reduce`, a per-event-id aggregate any batch reader runs.

    The parquet sink + checkpoint give exactly-once per micro-batch, so a
    kill-restart mid-input appends no duplicates (asserted in
    test_streaming.py)."""
    ev = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
        .withWatermark("ts", watermark)
        .alias("e")
    )
    od = (
        spark.readStream.schema(
            "user_id long, o_orderdate timestamp, o_orderkey long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(orders_path)
        .withWatermark("o_orderdate", watermark)
        .alias("o")
    )
    cond = F.expr(
        "e.user_id = o.user_id"
        " AND o.o_orderdate <= e.ts"
        f" AND o.o_orderdate >= e.ts - INTERVAL {horizon}"
    )
    pairs = ev.join(od, cond, "inner").select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.ts").alias("ts"),
        F.col("o.o_orderdate").alias("o_orderdate"),
        F.col("o.o_orderkey").alias("o_orderkey"),
    )
    return (
        pairs.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def asof_reduce(pairs: DataFrame) -> DataFrame:
    """(event_id → latest order at or before ts): argmax (o_orderdate,
    o_orderkey) per event — the identical tie-break to as_of_join."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_id").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("event_id", "user_id", F.col("o_orderkey").alias("asof_o_orderkey"))
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
        ts_list.sort()
        gap_us = gap_seconds * 1_000_000
        # interval-merge semantics so LATE (out-of-order, cross-batch)
        # events behave like the batch twin: an event within `gap` BEFORE
        # the open session extends it backwards; one further back becomes
        # its own (immediately closed) session instead of being silently
        # absorbed. Residual divergence vs batch: a session already emitted
        # can't be reopened by even-later arrivals — inherent to streaming
        # without watermark buffering.
        intervals: list[list[int]] = []  # [start_us, end_us, n]
        for t in ts_list:
            if intervals and t - intervals[-1][1] <= gap_us:
                intervals[-1][1] = max(intervals[-1][1], t)
                intervals[-1][2] += 1
            else:
                intervals.append([t, t, 1])
        if state.exists:
            s0, l0, n0 = state.get
            intervals.append([s0, l0, n0])
            intervals.sort()
            merged: list[list[int]] = []
            for iv in intervals:
                if merged and iv[0] - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], iv[1])
                    merged[-1][2] += iv[2]
                else:
                    merged.append(iv)
            intervals = merged
        *closed_iv, open_iv = intervals
        closed = [tuple(iv) for iv in closed_iv]
        state.update((open_iv[0], open_iv[1], open_iv[2]))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessions per user via
    applyInPandasWithState (per-user state = open session; a session closes
    when a later event exceeds the gap, or on processing-time timeout)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60),
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


DOCS_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

_TF_SCHEMA = "token string, doc_id bigint, tf bigint, dl bigint"


def read_tf_index(spark: SparkSession, index_dir: str):
    """(tf_index DF, stats DF) from the streamed index: rows from the
    current SnapshotTable version, (n_docs, sum_dl) from its version
    metadata — the two scalars commit ATOMICALLY with the rows they
    describe (meta.json is the version's commit marker)."""
    import pandas as pd

    from darkbo_spark.storage.snapshots import SnapshotTable

    tbl = SnapshotTable(index_dir, "tf_index")
    cur = tbl.current()
    if cur is None:
        tf = spark.createDataFrame([], _TF_SCHEMA)
        stats = spark.createDataFrame(
            pd.DataFrame({"n_docs": [0], "sum_dl": [0]})
        ).select(F.col("n_docs").cast("long"), F.col("sum_dl").cast("long"))
        return tf, stats
    meta = next(m for m in tbl.versions() if m["version"] == cur["version"])
    stats = spark.createDataFrame(
        pd.DataFrame({"n_docs": [meta["n_docs"]], "sum_dl": [meta["sum_dl"]]})
    ).select(F.col("n_docs").cast("long"), F.col("sum_dl").cast("long"))
    return tbl.read(spark), stats


def stream_docs_to_tf_index(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 4,
):
    """Streaming INCREMENTAL sparse-index maintenance: each micro-batch of
    landed documents upserts into the stored raw-statistics index
    (operators/tfidf.merge_tf_delta over a SnapshotTable), so the sparse
    index stays fresh as documents stream in — the production shape of
    'build once, serve many' when the corpus never stops growing.

    Exactly-once EFFECT under at-least-once foreachBatch:
    * the per-batch fingerprint is the batch_id, so replaying a batch
      whose publish committed hits the fingerprint skip;
    * tf rows and the (n_docs, sum_dl) stats commit ATOMICALLY — stats
      travel in the version's meta.json (the commit marker), never as a
      second table that could tear from its rows on a crash between
      publishes;
    * within the window where a replayed merge actually re-runs (crash
      before the meta commit), the current index cannot yet contain the
      batch, so the incremental stat deltas are exact.

    Batches are upserts: a doc_id re-landing REPLACES its old rows (the
    merge_tf_delta contract). Callers must not put two versions of one
    doc_id in a single file batch (last-writer is undefined there)."""
    from darkbo_spark.operators.tfidf import merge_tf_delta
    from darkbo_spark.storage.snapshots import SnapshotTable

    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        tbl = SnapshotTable(index_dir, "tf_index")
        fp = f"batch{batch_id}"
        if tbl.current_fingerprint() == fp:
            return  # committed replay
        tf, stats = read_tf_index(spark, index_dir)
        merged, new_stats = merge_tf_delta(tf, stats, batch_df)
        # localCheckpoint: the merged plan references the CURRENT version's
        # files; materialize before publish so expire() of old versions can
        # never race the write that reads them
        merged = merged.localCheckpoint(eager=True)
        ns = new_stats.collect()[0]
        tbl.publish(
            merged,
            fp,
            extra_meta={"n_docs": int(ns.n_docs), "sum_dl": int(ns.sum_dl)},
        )
        tbl.expire(retain_last=3)

    return (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_kg_upsert_table(spark: SparkSession, kg_path: str) -> DataFrame:
    """The materialized url-bucketed KG triple table (empty frame with the
    canonical schema when nothing has landed yet)."""
    import os

    schema = (
        "url string, sent_idx bigint, subj string, pred string, obj string, "
        "subj_eid string, obj_eid string, url_bucket int"
    )
    if not os.path.isdir(kg_path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(kg_path)


def stream_pages_to_kg_upsert(
    spark: SparkSession,
    input_path: str,
    kg_path: str,
    checkpoint_path: str,
    entity_dict: DataFrame,
    link_strategy: str = "broadcast",
    n_buckets: int = 32,
    max_files_per_trigger: int = 4,
):
    """Streaming KG MAINTENANCE at delta cost: each micro-batch of
    (re)fetched pages runs E→S→T→L and upserts by url into a triple table
    partitioned by url-hash bucket — only the buckets containing the
    batch's urls are read and rewritten (dynamic partition overwrite), so
    per-batch I/O scales with the delta's bucket footprint, never the
    corpus (the batch twin is kg/incremental.upsert_triples_by_url; the
    store layout mirrors parsed_search_stored's token-bucket pruning).

    Exactly-once EFFECT without a fingerprint: url-keyed delete-and-insert
    is IDEMPOTENT — replaying a committed batch removes the very rows it
    previously inserted and reinserts them, converging to the same table.
    A crash mid-way through the multi-bucket overwrite can leave a reader
    seeing some buckets new and some old until the replay converges; the
    production swap is an Iceberg MERGE (one atomic multi-partition
    commit) through the same storage seam (docs in storage/interface.py).

    Same caveat as the tf-index stream: two versions of one url inside a
    SINGLE file batch have undefined last-writer order — refetches land
    in separate files/batches by construction of a crawl frontier."""
    from darkbo_spark.kg.incremental import extract_and_link, upsert_triples_by_url

    def _bucket(col):
        return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        fresh = extract_and_link(batch_df, entity_dict, strategy=link_strategy)
        fresh = fresh.withColumn("url_bucket", _bucket(F.col("url")))
        delta_urls = batch_df.select("url").distinct()
        # bounded driver materialization: at most n_buckets ints
        buckets = [
            r.b for r in delta_urls.select(_bucket(F.col("url")).alias("b"))
            .distinct().collect()
        ]
        if os.path.isdir(kg_path):
            # partition-pruned read of ONLY the delta's buckets
            stale = read_kg_upsert_table(spark, kg_path).filter(
                F.col("url_bucket").isin(buckets)
            )
            merged = upsert_triples_by_url(stale, fresh, delta_urls)
        else:
            merged = fresh
        # the merged plan reads the same partitions the write overwrites —
        # cut the dependency before writing
        merged = merged.localCheckpoint(eager=True)
        (
            merged.repartition("url_bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("url_bucket")
            .parquet(kg_path)
        )
        # dynamic overwrite only rewrites partitions that received rows: a
        # delta bucket whose every triple was retired (refetch with no
        # extractable content) would silently keep its stale partition —
        # drop such buckets explicitly (idempotent: a replay re-drops)
        import shutil

        present = {
            r.b for r in merged.select(F.col("url_bucket").alias("b"))
            .distinct().collect()
        }
        for b in buckets:
            if b not in present:
                shutil.rmtree(
                    os.path.join(kg_path, f"url_bucket={b}"), ignore_errors=True
                )

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
