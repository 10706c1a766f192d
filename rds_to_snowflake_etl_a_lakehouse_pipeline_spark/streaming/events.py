"""Event-time windowed analytics (SURVEY.md §2.9 extension).

The reference is batch-only; these builders are batch-first and — by
Structured Streaming's unified API — run UNCHANGED on a streaming
DataFrame: the same ``F.window``/``session_window`` aggregation compiles
to an incremental stateful plan under ``readStream``. ``watermark``
bounds state for late data; without it a streaming session/tumbling agg
would hold state forever (fine in batch, fatal in a long-running job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling window per event_type: count + value sum."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) window counts."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sessionized(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per user: start, end, event count, value sum."""
    d = _maybe_watermark(df, ts_col, watermark)
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def running_user_totals(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator: per-user running event count + value sum
    via ``applyInPandasWithState`` — the escape hatch for semantics the
    built-in window aggregates can't express (cross-batch running state).

    State is one tiny tuple per user key, partitioned by ``user_col``
    (hash shuffle). Pass ``timeout_minutes`` on a CONTINUOUS trigger to
    evict keys after processing-time silence — bounded state at any
    scale. Leave it None for ``availableNow`` runs: a processing-time
    timeout keeps the availableNow query alive waiting to service
    timeouts, so it never terminates (measured).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{user_col} bigint, n_events bigint, total_value double"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        import pandas as pd

        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return df.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=timeout_conf,
    )


def dedup_events(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Exactly-once-ification: drop duplicate deliveries by key.

    Streaming: ``dropDuplicatesWithinWatermark`` — state holds one entry
    per key only inside the watermark horizon, so an at-least-once
    source (Kafka redelivery, file re-list, replayed batch) becomes
    exactly-once downstream with BOUNDED state; without the watermark
    bound the key set grows forever. Batch: plain ``dropDuplicates``
    (same result on the same input — unified API).
    """
    keys = list(key_cols)
    if df.isStreaming:
        if watermark:
            return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
        return df.dropDuplicates(keys)
    return df.dropDuplicates(keys)


def stream_events(
    spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream over a directory of parquet event files — the
    local stand-in for a Kafka/queue source; same downstream code."""
    return spark.readStream.schema(schema).parquet(path)


def stream_events_auto(spark: SparkSession, path: str) -> DataFrame:
    """:func:`stream_events` with the ``ts`` physical layout detected
    from one parquet footer, normalized to a session-zone TIMESTAMP.

    File streams require a declared schema, and the testdata ``events``
    table's ``ts`` layout has varied across generations: parquet
    TIMESTAMP(NANOS) (Spark can't read natively — declare ``bigint``
    under ``nanosAsLong`` and integer-``div`` down to micros),
    TIMESTAMP(MICROS) ``isAdjustedToUTC=false`` (declare
    ``timestamp_ntz``, cast — exact under the engine's pinned UTC
    session zone), or ``=true`` (plain ``timestamp``). One footer read
    on the driver (metadata only, no data pages) picks the branch, so
    the same streaming queries run against any generation — the exact
    batch twin of ``session.load``'s events normalization.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    arrow_schema = pq.read_schema(files[0]) if files else None
    ts_type = (
        arrow_schema.field("ts").type
        if arrow_schema is not None and "ts" in arrow_schema.names
        else None
    )
    unit = getattr(ts_type, "unit", None)
    tz = getattr(ts_type, "tz", "")
    if files and ts_type is not None:
        # pyarrow reports legacy INT96 timestamps (Spark's default
        # parquet writer output) as timestamp[ns] — same as real
        # TIMESTAMP(NANOS), which Spark CANNOT read as timestamp. Only
        # the physical type in the column chunk metadata tells them
        # apart; INT96 reads natively as a session-zone timestamp.
        md = pq.ParquetFile(files[0]).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}.get("ts")
        if (
            idx is not None
            and md.num_row_groups > 0
            and md.row_group(0).column(idx).physical_type == "INT96"
        ):
            return stream_events(spark, path)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        sdf = stream_events(
            spark, path, EVENTS_SCHEMA.replace("ts timestamp", "ts bigint")
        )
        return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if unit is not None and tz is None:
        sdf = stream_events(
            spark, path, EVENTS_SCHEMA.replace("ts timestamp", "ts timestamp_ntz")
        )
        return sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream_events(spark, path)


def run_available_now(
    sdf: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming aggregation over all currently-available input
    (trigger=availableNow) into an in-memory sink; returns the result
    table. Complete mode for full-window aggs; pass ``update`` for
    stateful operators (``applyInPandasWithState``) that emit deltas."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(query_name)


def stream_to_warehouse(
    sdf: DataFrame,
    sink,
    table: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
    query_name: str = "stream_to_warehouse",
):
    """Land a streaming result in the warehouse via ``foreachBatch`` —
    the streaming twin of the reference's gold→Snowflake write
    (dim_customers_gold.py:72-81): each micro-batch is a plain
    DataFrame handed to the same :class:`~..sources.io.WarehouseSink`
    the batch pipeline uses, so catalog/JDBC/Snowflake backends all
    work unchanged. Complete mode overwrites the target per batch
    (idempotent for full-window aggs); append mode appends. The
    checkpoint directory gives exactly-once batch tracking across
    restarts. Runs with trigger=availableNow and blocks until the
    available input is drained — swap the trigger for a continuous
    deployment.
    """
    mode = "overwrite" if output_mode == "complete" else "append"

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        sink.write(batch_df, table, mode=mode)

    q = (
        sdf.writeStream.foreachBatch(_land)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_incremental_merge(
    sdf: DataFrame,
    table: str,
    keys: tuple[str, ...],
    watermark_col: str,
    checkpoint_dir: str,
    order_col: str | None = None,
    query_name: str = "stream_incremental_merge",
):
    """Streaming CDC landing: every micro-batch is MERGEd into the
    catalog target through ``plans.incremental.incremental_upsert``
    (last-writer-wins upsert + stage-and-swap write) instead of
    complete-mode overwrite — the streaming form of an RDS→warehouse
    sync where the source is a change feed. Updates within and across
    micro-batches resolve by ``order_col`` (default: the watermark
    column), re-delivered rows merge onto themselves (idempotent), and
    the checkpoint gives exactly-once batch tracking across restarts.

    The batch path's high-watermark filter is deliberately OFF here
    (``filter_stale=False``): micro-batches arrive in file-discovery
    order, not event-time order, so a later-timestamp batch landing
    first would raise the watermark and silently drop earlier rows the
    stream simply hadn't delivered yet. The checkpoint already ensures
    each input file is processed exactly once; out-of-order updates are
    resolved by the merge itself. Runs with trigger=availableNow and
    blocks until the available input is drained.
    """
    from ..plans.incremental import incremental_upsert

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        incremental_upsert(
            batch_df.sparkSession,
            batch_df,
            table,
            list(keys),
            watermark_col,
            order_col=order_col,
            filter_stale=False,
            prefer="order",
        )

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_corpus_dedup(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
    query_name: str = "stream_corpus_dedup",
    append: bool = True,
    log_skew: bool | None = None,
    **sig_kwargs,
):
    """Streaming corpus curation: every micro-batch of arriving
    documents is near-dup-checked against the persisted MinHash index
    (and within itself) through
    ``operators.dedup.minhash_incremental_dedup``; survivors' signatures
    append to the index so later batches dedup against everything seen.
    The streaming form of a standing ingest pipeline — each batch pays
    its own signatures plus one bucketed probe join, never a corpus
    re-scan. Signature parameters must match the
    ``minhash_build_index`` call that created ``table``.

    Unlike exact ``dedup_events`` (state-store keyed dropDuplicates),
    the dedup criterion here is NEAR-duplication — state lives in the
    bucketed index table, not the streaming state store, so it
    survives restarts and is queryable/compactable like any table.
    Runs with trigger=availableNow and blocks until input is drained.

    ``append=False`` is the measure/dry-run mode: batches are still
    signed and probed (identical per-batch cost) but survivors'
    signatures don't extend the index — used by the bench's streaming
    steady-state query so regression re-times measure identical work.

    ``log_skew`` (round 17): per-batch bucket-skew reports — defaulted
    ON when ``max_bucket_size`` is set, like the batch API — are
    BUFFERED and flushed to the ``{table}_skew_log`` companion in ONE
    post-drain write, the same batching contract as
    ``stream_ivf_append``'s drift log (the bench's q22 pins the
    uninstrumented per-batch body with ``log_skew=False``, the q11
    crc32 precedent). The flush is epoch-guarded exactly like the IVF
    drift flush (:func:`_flush_ivf_drift_reports`): a
    ``minhash_build_index`` rebuild landing between the last
    micro-batch and the flush re-derives every bucket key AND clears
    the log, so buffered reports measured against the retired corpus
    are dropped instead of re-arming ``cap_truncating`` on the fresh
    index."""
    from ..operators.dedup import minhash_incremental_dedup
    from ..sources.io import get_table_meta

    reports: list[dict] = []
    if log_skew is None:
        log_skew = max_bucket_size is not None
    held_epoch = get_table_meta(sdf.sparkSession, table).get("skew_epoch")

    def _dedup(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        minhash_incremental_dedup(
            batch_df.sparkSession,
            table,
            batch_df,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
            append=append,
            max_bucket_size=max_bucket_size,
            log_skew=log_skew,
            skew_sink=reports if log_skew else None,
            **sig_kwargs,
        )

    q = (
        sdf.writeStream.foreachBatch(_dedup)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _flush_minhash_skew_reports(sdf.sparkSession, table, held_epoch, reports)


def _flush_minhash_skew_reports(
    spark, table: str, held_epoch, reports: list[dict]
) -> None:
    """Post-drain skew-log flush, epoch-guarded like
    :func:`_flush_ivf_drift_reports`: a ``minhash_build_index`` rebuild
    from another session landing mid-drain re-derives every bucket key
    and clears the log — buffered reports measured under the retired
    epoch would re-arm ``cap_truncating`` on the fresh index, so the
    buffer is dropped when the recorded epoch no longer matches. One
    constant-time SHOW TBLPROPERTIES, then one write."""
    from ..operators.dedup import minhash_append_skew_reports
    from ..sources.io import get_table_meta

    recorded = get_table_meta(spark, table).get("skew_epoch")
    if recorded != held_epoch:
        reports = []
    minhash_append_skew_reports(spark, table, reports)


def stream_media_dedup(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    query_name: str = "stream_media_dedup",
    append: bool = True,
    log_skew: bool | None = None,
):
    """Streaming MEDIA curation: every micro-batch of arriving
    fingerprinted blobs is near-dup-checked against the persisted
    Hamming index (and within itself) through
    ``operators.multimodal.hamming_incremental_dedup``; survivors'
    banded fingerprints append to the index so later batches dedup
    against everything seen — the media twin of
    :func:`stream_corpus_dedup`, with the same state story: state
    lives in a bucketed catalog table, not the streaming state store,
    so it survives restarts and is queryable/compactable like any
    table (``maintenance.py`` sweeps it like the MinHash index).

    The stream carries the HASH column (compute it in the stream
    transform via ``image_perceptual_hash`` / ``audio_spectral_hash``
    — both are plain ``mapInPandas``, streaming-legal); this wrapper
    stays modality-agnostic. Runs with trigger=availableNow and blocks
    until input is drained. ``append=False`` is the measure/dry-run
    mode, as on the MinHash twin.

    ``log_skew`` (late r17): per-batch bucket-skew reports — defaulted
    ON when ``max_bucket_size`` is set, like the batch API — are
    BUFFERED and flushed to the ``{table}_skew_log`` companion in ONE
    post-drain write, epoch-guarded exactly like
    :func:`_flush_minhash_skew_reports`: a ``hamming_index_build``
    rebuild landing mid-drain re-derives every (band, val) key and
    clears the log, so buffered reports measured against the retired
    corpus are dropped instead of re-arming ``cap_truncating``."""
    from ..operators.multimodal import hamming_incremental_dedup
    from ..sources.io import get_table_meta

    reports: list[dict] = []
    if log_skew is None:
        log_skew = max_bucket_size is not None
    held_epoch = get_table_meta(sdf.sparkSession, table).get("skew_epoch")

    def _dedup(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hamming_incremental_dedup(
            batch_df.sparkSession,
            table,
            batch_df,
            id_col=id_col,
            hash_col=hash_col,
            max_hamming=max_hamming,
            append=append,
            max_bucket_size=max_bucket_size,
            log_skew=log_skew,
            skew_sink=reports if log_skew else None,
        )

    q = (
        sdf.writeStream.foreachBatch(_dedup)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _flush_hamming_skew_reports(sdf.sparkSession, table, held_epoch, reports)


def _flush_hamming_skew_reports(
    spark, table: str, held_epoch, reports: list[dict]
) -> None:
    """Post-drain skew-log flush for the Hamming index, epoch-guarded
    like :func:`_flush_minhash_skew_reports`: a rebuild (or reband)
    from another session landing mid-drain re-derives every (band,
    val) key and clears the log — buffered reports measured under the
    retired epoch would re-arm ``cap_truncating`` on the fresh index,
    so the buffer is dropped when the recorded epoch no longer
    matches. One constant-time SHOW TBLPROPERTIES, then one write."""
    from ..operators.multimodal import hamming_append_skew_reports
    from ..sources.io import get_table_meta

    recorded = get_table_meta(spark, table).get("skew_epoch")
    if recorded != held_epoch:
        reports = []
    hamming_append_skew_reports(spark, table, reports)


def stream_entity_resolution(
    sdf: DataFrame,
    table: str,
    id_col: str,
    text_col: str,
    block_key,
    checkpoint_dir: str,
    threshold: float = 0.9,
    max_block_size: int | None = None,
    query_name: str = "stream_entity_resolution",
    log_skew: bool | None = None,
):
    """Streaming master-data resolution: every micro-batch of arriving
    records resolves against the standing ER index through
    ``operators.entity.er_incremental`` (blocking join + batch-sized
    clustering + append + relabel bookkeeping) — the streaming form of
    continuous entity mastering over a record feed.

    Because ``er_incremental``'s contract is exact equality with
    from-scratch resolution for ANY split, the final
    ``er_entity_labels`` state is invariant to how the stream happened
    to be micro-batched — including a bridging record arriving before
    or after the entities it merges. The checkpoint gives exactly-once
    file tracking; re-delivered records resolve onto themselves (their
    id already carries their entity, similarity 1.0 → same label).
    Runs with trigger=availableNow and blocks until input is drained.

    ``log_skew`` (late r17): per-batch block-skew reports — defaulted
    ON when ``max_block_size`` is set, like the batch API — are
    BUFFERED and flushed to the ``{table}_skew_log`` companion in ONE
    post-drain write, epoch-guarded exactly like the minhash/hamming
    twins (an ``er_build_index`` rebuild or ``er_reblock_index``
    landing mid-drain re-derives every block key and clears the log,
    so stale buffered reports are dropped)."""
    from ..operators.entity import er_incremental
    from ..sources.io import get_table_meta

    reports: list[dict] = []
    if log_skew is None:
        log_skew = max_block_size is not None
    held_epoch = get_table_meta(sdf.sparkSession, table).get("skew_epoch")

    def _resolve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        er_incremental(
            batch_df.sparkSession,
            table,
            batch_df,
            id_col,
            text_col,
            block_key,
            threshold=threshold,
            max_block_size=max_block_size,
            log_skew=log_skew,
            skew_sink=reports if log_skew else None,
        )

    q = (
        sdf.writeStream.foreachBatch(_resolve)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _flush_er_skew_reports(sdf.sparkSession, table, held_epoch, reports)


def _flush_er_skew_reports(
    spark, table: str, held_epoch, reports: list[dict]
) -> None:
    """Post-drain skew-log flush for the ER index, epoch-guarded like
    the minhash/hamming twins: a rebuild or reblock from another
    session landing mid-drain re-derives every block key and clears
    the log — buffered reports measured under the retired epoch would
    re-arm ``cap_truncating`` on the fresh index, so the buffer is
    dropped when the recorded epoch no longer matches. One
    constant-time SHOW TBLPROPERTIES, then one write."""
    from ..operators.entity import er_append_skew_reports
    from ..sources.io import get_table_meta

    recorded = get_table_meta(spark, table).get("skew_epoch")
    if recorded != held_epoch:
        reports = []
    er_append_skew_reports(spark, table, reports)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str = "0 seconds",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + time-interval join: each ``left`` row matches ``right``
    rows with the same ``key`` and ``right_ts`` in
    ``[left_ts + lower, left_ts + upper]`` — the attribution/correlation
    join (click→purchase within 2 h, signup→first error, …).

    Batch: compiles to one shuffle per side on ``key`` with the range
    predicate as a join filter — never a nested loop. Streaming (both
    sides under ``readStream``): Spark's symmetric stateful join; the
    time-range condition plus a ``watermark`` on BOTH sides lets the
    engine evict left rows older than ``watermark + upper`` and right
    rows older than ``watermark`` from state, so state is bounded on an
    unbounded feed (without the watermark an inner join still runs but
    state grows forever). Emit mode is append — a match emits exactly
    once, when it forms.

    ``left_ts`` and ``right_ts`` must be DIFFERENT names (rename one
    side), and non-key columns must be disjoint — the joined row carries
    both sides' columns. ``key`` appears once in the output (the LEFT
    side's value), so only ``inner``/``left`` joins are accepted: a
    right/full join would surface right-only rows with a NULL key after
    the drop. Swap the sides (the interval is directional — also negate
    the bounds) instead of asking for a right join.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r} "
            "(swap the sides and negate the bounds for the right-join form)"
        )
    l = _maybe_watermark(left, left_ts, watermark).alias("l")
    r = _maybe_watermark(right, right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{key}"))


def stream_static_join(
    stream_df: DataFrame, dim_df: DataFrame, join_expr, how: str = "inner"
) -> DataFrame:
    """Enrich a stream with a static dimension table — the standard
    streaming-ETL lookup. The static side is broadcast, so each
    micro-batch joins map-side with ZERO shuffle and zero streaming
    state; Spark re-reads the dim source per batch, picking up slowly
    changing dims for free. Works identically on batch inputs (unified
    API) — which is how the DuckDB oracle verifies it.
    """
    return stream_df.join(F.broadcast(dim_df), join_expr, how)


def stream_versioned_merge(
    sdf: DataFrame,
    root: str,
    keys: tuple[str, ...],
    order_col: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    tiebreakers: tuple[str, ...] = (),
    allow_new_columns: bool = False,
    query_name: str = "stream_versioned_merge",
):
    """Streaming CDC landing into a :class:`~..sources.versioned.
    VersionedTable`: every micro-batch commits ONE new snapshot version
    via partition-scoped copy-on-write MERGE, so downstream readers
    always see a complete, committed snapshot — never a half-applied
    batch — and can time-travel to any earlier micro-batch's state.
    This is the transactional upgrade of :func:`stream_incremental_merge`
    (whose stage-and-swap target has a visibility gap during the swap).

    ``order_col`` (+ ``tiebreakers``) is the arrival-order-invariance
    contract: within a micro-batch it resolves duplicate keys (last
    writer wins), and ACROSS batches each batch's rows are resolved
    against the current snapshot's rows for the same keys before the
    merge — micro-batches arrive in file-discovery order, not
    event-time order, so a late-arriving OLDER version of a key must
    lose to the newer one already in the table (same contract as
    :func:`stream_incremental_merge`'s ``prefer="order"``). The
    resolution join is key-bounded (semi-join of current on the batch's
    keys), re-delivered rows resolve onto themselves, and a batch
    replayed after a crash (committed to the table but not yet to the
    stream checkpoint) re-applies the identical merge — an extra
    version, same content: idempotent where it matters. ``partition_by``
    bounds each commit's rewrite to the touched partitions (see
    ``VersionedTable.merge``'s key-migration contract).

    ``allow_new_columns`` opts into ADDITIVE schema evolution
    mid-stream — the same contract as batch
    ``VersionedTable.merge(allow_new_columns=True)``: a micro-batch
    carrying columns the table has never seen commits them (existing
    rows read back NULL there; time travel shows each version's own
    schema). A standing CDC landing must survive an upstream column
    add without operator intervention; the default stays False and an
    unexpected new column FAILS the stream loudly (it previously was
    silently projected away — dropped CDC data). Columns may only be
    added, never removed or retyped — under evolution a batch MISSING
    a known column lands NULL for it on the rows it carries (its rows
    ARE the key's newest version).

    Runs with trigger=availableNow and blocks until drained.
    """
    from ..operators.windows import dedupe_latest
    from ..sources.versioned import VersionedTable

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = dedupe_latest(
            batch_df, list(keys), order_col, tiebreakers=list(tiebreakers)
        )
        vt = VersionedTable(batch_df.sparkSession, root)
        if vt.latest_version() is None:
            vt.write(b, partition_by=partition_by)
            return
        relevant = vt.read().join(
            b.select(*keys).distinct(), list(keys), "leftsemi"
        )
        if allow_new_columns:
            # both directions null-fill: the batch may carry brand-new
            # columns (table rows read NULL) and may lack old ones
            merged_in = relevant.unionByName(b, allowMissingColumns=True)
        else:
            extra = [c for c in b.columns if c not in relevant.columns]
            if extra:
                raise ValueError(
                    f"micro-batch carries columns {extra} the versioned "
                    f"table at {root!r} does not have; pass "
                    "allow_new_columns=True to opt into additive schema "
                    "evolution (the same contract as batch merge) — the "
                    "default fails loudly rather than silently dropping "
                    "CDC data"
                )
            merged_in = relevant.unionByName(b.select(*relevant.columns))
        resolved = dedupe_latest(
            merged_in,
            list(keys),
            order_col,
            tiebreakers=list(tiebreakers),
        )
        vt.merge(resolved, list(keys), allow_new_columns=allow_new_columns)

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _checkpoint_stream_id(spark: SparkSession, checkpoint_dir: str) -> str:
    """The Structured Streaming query id persisted in the checkpoint's
    ``metadata`` file — STABLE across restarts from the same checkpoint
    (unlike ``runId``, which changes per start and would break crash
    replay), and FRESH for a new/cleared checkpoint directory. This is
    the scope every replay stamp must carry: bare batch ids restart at
    0 when a stream is re-pointed at a new checkpoint, so a stamp that
    is only a batch id collides with stale history in a reused state
    table. Deliberately NOT cached: a long-lived driver can clear and
    recreate the same checkpoint directory (getting a new id), and a
    cached entry would hand the NEW stream the OLD id — re-creating
    exactly the stamp collision this function exists to prevent. The
    read is one tiny file per micro-batch, noise next to the batch's
    Spark jobs. Falls back to the directory path itself if the
    metadata file is unreadable (pre-start probing — still
    checkpoint-scoped, and never cached so the real id takes over the
    moment the stream materializes it)."""
    import json

    path = checkpoint_dir.rstrip("/") + "/metadata"
    try:
        local = path[7:] if path.startswith("file://") else path
        with open(local, encoding="utf-8") as fh:
            return json.loads(fh.read())["id"]
    except (OSError, KeyError, ValueError):
        try:
            # non-local checkpoint (HDFS/S3): one Hadoop FS open per
            # micro-batch — a metadata HEAD+read, NOT a Spark job (the
            # previous spark.read.text fallback scheduled a full job
            # per batch just to fetch an 80-byte file)
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(path)
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            stream = fs.open(p)
            try:
                txt = jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
            return json.loads(txt)["id"]
        except Exception:
            return checkpoint_dir


def _stream_stamp(stream_id: str, batch_id: int) -> int:
    """Checkpoint-scoped replay stamp: a deterministic 64-bit hash of
    (stream id, batch id). Deterministic so a crash-redelivered batch
    reproduces its own stamp (the skip still works across process
    restarts); stream-scoped so a FRESH checkpoint whose batch ids
    restart at 0 can never collide with stamps a previous stream left
    in a reused state table (bare-id stamps silently DROPPED such a
    batch). Emits a bigint; state written pre-upgrade needs care at
    the boundary — whole-table guards honor a legacy bare-id match
    (:func:`_replay_guarded_state`), and legacy sessionize tables
    whose ``_applied_batch`` column is 32-bit keep bare-id stamps
    outright (``_sessionize_merge_batch`` detects the dtype) since a
    positional insertInto of a 64-bit hash would fail ANSI store
    assignment there."""
    import hashlib

    h = hashlib.sha256(f"{stream_id}\x00{batch_id}".encode()).digest()
    return int.from_bytes(h[:8], "big", signed=True)


def _replay_guarded_state(
    spark: SparkSession, table: str, stamp: int, batch_id: int | None = None
):
    """Whole-table crash-replay guard for additive state (sketches):
    the state carries the last applied stamp (``_applied_batch``,
    atomic with the data — same stage-and-swap); returns None when this
    exact stamp was already merged (skip), else the state WITHOUT the
    stamp column, ready to union with the batch. Without this, a batch
    redelivered after a crash-before-checkpoint would re-ADD its
    counts into the sketch. ``stamp`` is the checkpoint-scoped
    :func:`_stream_stamp`, never a bare batch id — see its docstring
    for the fresh-checkpoint collision this prevents.

    ``batch_id`` closes the upgrade window: state last stamped by
    PRE-upgrade code carries a bare batch id, and a batch applied
    then crash-redelivered across the upgrade must still skip — so a
    legacy ``last == batch_id`` match is honored too. This is exactly
    pre-upgrade semantics, INCLUDING its known flaw: while the stamp
    is still legacy, a brand-new stream (fresh checkpoint, ids restart
    at 0) whose batch N coincides with the stale bare id N is skipped
    — the same behavior the old code had, held only until the first
    post-upgrade merge rewrites the stamp as a 64-bit hash (after
    which a bare-id collision has ~2^-33 probability). Re-pointing a
    NEW stream at an OLD state table without resetting it was already
    outside the state-table contract; this keeps the failure no worse
    than before while fixing the crash-redelivery over-count."""
    state = spark.table(table)
    if "_applied_batch" in state.columns:
        last = state.select(F.first("_applied_batch")).first()[0]
        if last is not None and (
            last == stamp or (batch_id is not None and last == batch_id)
        ):
            return None
        state = state.drop("_applied_batch")
    return state


def _dynamic_partition_overwrite(
    df: DataFrame, table: str, part_col: str
) -> None:
    """Overwrite ONLY the target partitions present in ``df`` (dynamic
    partition-overwrite ``insertInto`` with the conf saved/restored and
    the catalog's column order pinned — insertInto matches columns by
    POSITION, partition column last). Shared by every partition-scoped
    sink/state writer so the dance exists once."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        cols = [c for c in spark.table(table).columns if c != part_col]
        df.select(*cols, part_col).write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _land_batch_partition(
    df: DataFrame, sink: str, batch_id: int, stream_id: str | None = None
) -> None:
    """Land one micro-batch's rows in the sink's own ``_batch_id``
    partition via DYNAMIC partition overwrite — a batch redelivered
    after a crash-before-checkpoint overwrites its partition with
    identical rows instead of appending a duplicate copy. Shared by
    the quarantine and span-dedup sinks; batch-grain partitions double
    as compaction/triage units at scale.

    ``stream_id`` (the checkpoint's :func:`_checkpoint_stream_id`)
    guards the overwrite against CHECKPOINT CHANGES: batch ids restart
    at 0 under a fresh checkpoint, so without the guard a reused sink's
    old ``_batch_id=0`` partition would be silently REPLACED by the new
    stream's batch 0 — data loss, not duplication. The sink records its
    writer's stream id in table metadata; on mismatch every existing
    non-negative partition is first folded into an archive partition
    (:func:`_fold_batch_partitions` — the old stream will never replay
    into this sink again, so its replay window may close), then the new
    id is recorded and landing proceeds. Sinks that predate the
    metadata adopt the current stream id on first contact (the past is
    unverifiable; collisions before adoption are undetectable).

    LEGACY sinks (created by the pre-partitioning append path, no
    ``_batch_id`` column) keep plain appends — their original
    at-least-once contract — instead of failing the stream on a
    column-count mismatch."""
    from ..sources.io import get_table_meta, set_table_meta, write_table

    spark = df.sparkSession
    stamped = df.withColumn("_batch_id", F.lit(batch_id))
    if not spark.catalog.tableExists(sink):
        write_table(stamped, sink, partition_by=["_batch_id"])
        # fold_scheme marks the sink as manifest-protocol from birth,
        # so the legacy crashed-fold guard in _fold_batch_partitions
        # can never false-positive on a table this code created
        if stream_id is not None:
            set_table_meta(
                spark, sink, stream_id=stream_id, fold_scheme="manifest"
            )
        else:
            set_table_meta(spark, sink, fold_scheme="manifest")
        return
    if "_batch_id" not in spark.table(sink).columns:
        write_table(df, sink, mode="append")
        return
    if stream_id is not None:
        recorded = get_table_meta(spark, sink).get("stream_id")
        if recorded is None:
            set_table_meta(spark, sink, stream_id=stream_id)
        elif recorded != stream_id:
            _resume_pending_fold(spark, sink)  # finish any crashed fold
            ids = _batch_partition_ids(spark, sink)
            if ids:
                _fold_batch_partitions(spark, sink, max(ids))
            set_table_meta(spark, sink, stream_id=stream_id)
    _dynamic_partition_overwrite(stamped, sink, "_batch_id")


def _batch_partition_ids(spark: SparkSession, table: str) -> list[int]:
    """Sorted non-negative ``_batch_id`` partition values (live batch
    partitions; negatives are compaction archives)."""
    part_rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
    return sorted(
        bid
        for r in part_rows
        for bid in [int(r[0].split("=", 1)[1])]
        if bid >= 0
    )


def _next_archive_id(spark: SparkSession, table: str) -> int:
    """Allocate a fresh archive partition id: one below the most
    negative existing id. NOT derived from the folded batch ids —
    batch ids restart at 0 under a fresh checkpoint (see
    :func:`_land_batch_partition`), so an id-derived archive slot
    could collide with (and dynamic-overwrite away) an archive from a
    previous stream epoch."""
    part_rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
    negs = [
        bid
        for r in part_rows
        for bid in [int(r[0].split("=", 1)[1])]
        if bid < 0
    ]
    return (min(negs) if negs else 0) - 1


def _pending_fold(spark: SparkSession, table: str):
    """Read the fold manifest: ``(max_fold, archive_id, phase)`` or
    None. The manifest is a table property written ATOMICALLY before
    any data moves, so every crash window inside a fold is resumable
    from it (see :func:`_fold_batch_partitions`)."""
    from ..sources.io import get_table_meta

    raw = get_table_meta(spark, table).get("pending_fold")
    if not raw:
        return None
    max_fold, archive_id, phase = raw.split(":")
    return int(max_fold), int(archive_id), phase


def _set_pending_fold(
    spark: SparkSession, table: str, max_fold: int, archive_id: int, phase: str
) -> None:
    from ..sources.io import set_table_meta

    set_table_meta(
        spark, table, pending_fold=f"{max_fold}:{archive_id}:{phase}"
    )


def _clear_pending_fold(spark: SparkSession, table: str) -> None:
    from ..sources.io import _INDEX_META_PREFIX

    spark.sql(
        f"ALTER TABLE {table} UNSET TBLPROPERTIES IF EXISTS "
        f"('{_INDEX_META_PREFIX}pending_fold')"
    )


def _fold_batch_partitions(
    spark: SparkSession, table: str, max_fold: int
) -> dict:
    """Fold every live ``_batch_id`` partition ``<= max_fold`` into one
    fresh archive partition, MANIFEST-FIRST so any crash resumes
    exactly (never re-deriving the plan from post-crash state — the
    bug class where new batches landing after a crash enlarge the fold
    set, a different archive id is computed, and the still-undropped
    rows are archived a second time beside the stale partial archive):

    1. write manifest ``(max_fold, archive_id, staged)`` — atomic
       catalog op, fixes the plan;
    2. dynamic-overwrite the folded rows into ``archive_id`` (a crash
       mid-write leaves at worst a partial archive partition, healed
       because resume RE-OVERWRITES from the still-present sources);
    3. advance manifest to ``archived`` — from here the archive is the
       source of truth;
    4. drop the folded source partitions (each idempotent);
    5. clear the manifest.

    Resume (:func:`_resume_pending_fold`) re-enters at the recorded
    phase: ``staged`` ⇒ no source was dropped yet, so re-overwriting
    the SAME archive id from sources is exact; ``archived`` ⇒ sources
    still present are leftovers of an interrupted drop loop — just
    finish dropping them. Both are idempotent under repeated crashes.
    """
    ids = [b for b in _batch_partition_ids(spark, table) if b <= max_fold]
    if not ids:
        return {"folded_partitions": 0, "archived_rows": 0, "archive_id": None}
    # LEGACY upgrade guard: the pre-manifest fold archived into
    # -(max_folded+1) and healed crashes by re-deriving that same id.
    # A table carrying exactly that crash state (the derived negative
    # partition exists, sources undropped, NO manifest) must not fold
    # under a fresh id — the stale partial archive would keep its copy
    # and the rows would be double-counted. But the state is ambiguous
    # (the negative could be a COMPLETED legacy archive whose id the
    # restarted stream's batch ids re-reached), so neither silent
    # reuse (may overwrite real history) nor silent fresh-id (may
    # duplicate) is safe: fail loud with the operator's two options.
    from ..sources.io import get_table_meta, set_table_meta

    legacy_candidate = -(max(ids) + 1)
    part_rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
    negs = {
        bid
        for r in part_rows
        for bid in [int(r[0].split("=", 1)[1])]
        if bid < 0
    }
    # ...but only for tables that have never folded under THIS scheme:
    # every manifest-scheme fold stamps fold_scheme below, and a table
    # whose archives are all manifest-scheme can legitimately reach
    # the candidate id again after a batch-id restart (the stream-id
    # rebase path) — raising there would be a false positive forever.
    if (
        legacy_candidate in negs
        and get_table_meta(spark, table).get("fold_scheme") != "manifest"
    ):
        raise RuntimeError(
            f"{table}: partition _batch_id={legacy_candidate} looks like a "
            "pre-manifest fold's archive for exactly the live batches about "
            "to fold, with no fold manifest — either a legacy crashed fold "
            "(re-archiving would duplicate its rows) or a completed legacy "
            "archive after a batch-id restart (reusing its slot would "
            "overwrite history). Resolve once by hand: if the live batch "
            "partitions' rows are already IN that archive, drop the live "
            f"partitions; otherwise ALTER TABLE {table} PARTITION "
            f"(_batch_id={legacy_candidate}) RENAME to a lower id, then "
            "re-run compaction."
        )
    archive_id = _next_archive_id(spark, table)
    set_table_meta(spark, table, fold_scheme="manifest")
    _set_pending_fold(spark, table, max_fold, archive_id, "staged")
    return _execute_fold(spark, table, max_fold, archive_id, "staged")


def _execute_fold(
    spark: SparkSession,
    table: str,
    max_fold: int,
    archive_id: int,
    phase: str,
) -> dict:
    """Run a manifested fold from ``phase`` to completion (see
    :func:`_fold_batch_partitions` for the protocol)."""
    ids = [b for b in _batch_partition_ids(spark, table) if b <= max_fold]
    n_rows = 0
    if phase == "staged":
        if ids:
            merged = (
                spark.table(table)
                .filter(F.col("_batch_id").isin(ids))
                .withColumn("_batch_id", F.lit(archive_id))
                # reads the table being overwritten: materialize first
                # (folded-rows-sized, never total-history-sized)
                .localCheckpoint(eager=True)
            )
            n_rows = merged.count()
            _dynamic_partition_overwrite(merged, table, "_batch_id")
        _set_pending_fold(spark, table, max_fold, archive_id, "archived")
    for bid in ids:
        spark.sql(
            f"ALTER TABLE {table} DROP IF EXISTS PARTITION (_batch_id={bid})"
        )
    _clear_pending_fold(spark, table)
    return {
        "folded_partitions": len(ids),
        "archived_rows": n_rows if phase == "staged" else None,
        "archive_id": archive_id if ids else None,
    }


def _resume_pending_fold(spark: SparkSession, table: str) -> dict | None:
    """Complete a fold a previous run crashed inside of, from its
    manifest. Returns the completion stats, or None when no fold was
    pending. Safe to call any time the owning stream is stopped."""
    pending = _pending_fold(spark, table)
    if pending is None:
        return None
    max_fold, archive_id, phase = pending
    return _execute_fold(spark, table, max_fold, archive_id, phase)


def compact_batch_partitions(
    spark: SparkSession,
    table: str,
    keep_last: int = 1,
) -> dict:
    """Maintenance for ``_batch_id``-partitioned sinks (quarantine,
    span-dedup): fold every non-negative partition except the newest
    ``keep_last`` into one NEW archive partition, then drop the folded
    originals — a long-running stream otherwise accretes one small
    partition per micro-batch forever. Replay-safe: Structured
    Streaming only ever redelivers the most recent uncommitted batch
    id, so with ``keep_last >= 1`` a replayed batch still finds (and
    overwrites) its own partition.

    Archive ids are allocated downward (``min existing negative − 1``,
    never derived from batch ids, which restart under a fresh
    checkpoint), one per compaction, never touched again — so a run
    costs O(newly folded rows), NOT O(total archived history). Every
    fold is MANIFEST-FIRST (``_fold_batch_partitions``): a crash in any
    window — before the archive lands, mid-archive, between archive and
    drops, mid-drops — resumes from the recorded plan on the next call,
    never duplicating rows even if new batches landed in between (the
    fold set is pinned by the manifest, not recomputed). Archive
    partitions accumulate one per compaction (coarse — run weekly, get
    weekly archives) and are excluded from later folds. Run while the
    stream is STOPPED. Returns
    ``{"folded_partitions": n, "archived_rows": m, "archive_id": a}``
    for the new fold (resume of a crashed prior fold happens first and
    is reported under ``"resumed"`` when one existed).
    """
    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (got {keep_last}): the newest batch "
            "partition is the streaming replay window — folding it lets a "
            "crash-redelivered batch duplicate its rows beside the archive"
        )
    resumed = _resume_pending_fold(spark, table)
    ids = _batch_partition_ids(spark, table)
    fold = ids[: len(ids) - keep_last]
    if not fold:
        out = {"folded_partitions": 0, "archived_rows": 0, "archive_id": None}
    else:
        out = _fold_batch_partitions(spark, table, max(fold))
    if resumed is not None:
        out["resumed"] = resumed
    return out


def stream_frequency_sketch(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    value_col: str = "user_id",
    depth: int = 5,
    width: int = 4096,
    seed: int = 42,
    hash_impl: str = "xxhash64",
    query_name: str = "stream_frequency_sketch",
):
    """Streaming heavy-hitter state: each micro-batch is count-min
    sketched (``operators.sketches.cms_sketch``) and merged into the
    persisted sketch table, so point-frequency / top-k-candidate
    queries over the WHOLE stream history are answerable at any time
    without replaying events — the frequency twin of
    :func:`stream_corpus_dedup`'s index-table pattern. State lives in
    an ordinary table (restart-proof, queryable, mergeable further),
    not the streaming state store.

    Per batch: one explode+groupBy over the batch (batch-sized), then
    a merge with the existing sketch — which is BOUNDED at ``keys ×
    depth × width`` cells regardless of stream length, so the
    stage-and-swap rewrite each batch pays is KBs-to-MBs forever.
    Sketch parameters must match across every writer to ``table``.
    Runs with trigger=availableNow and blocks until input is drained.
    """
    from ..operators.sketches import cms_merge, cms_sketch
    from ..sources.io import write_table

    keys = keys or []

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sketch = cms_sketch(
            batch_df, keys, value_col, depth=depth, width=width, seed=seed,
            hash_impl=hash_impl,
        )
        stamp = _stream_stamp(
            _checkpoint_stream_id(spark, checkpoint_dir), batch_id
        )
        if spark.catalog.tableExists(table):
            state = _replay_guarded_state(spark, table, stamp, batch_id)
            if state is None:  # this exact batch already merged
                return
            merged = cms_merge(state.unionByName(batch_sketch), keys)
            # the union reads the table being overwritten: materialize
            # the (bounded, cell-count-sized) merge before the swap
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = batch_sketch
        write_table(merged.withColumn("_applied_batch", F.lit(stamp)), table)

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_distinct_sketch(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    value_col: str = "user_id",
    p: int = 10,
    hash_impl: str = "xxhash64",
    query_name: str = "stream_distinct_sketch",
):
    """Streaming distinct-count state — the HLL member of the sketch
    trio's streaming twins (:func:`stream_frequency_sketch` =
    frequencies, :func:`stream_histogram_sketch` = quantiles): each
    micro-batch is register-sketched
    (``operators.sketches.hll_register_sketch``) and max-merged into
    the persisted register table, so distinct counts over the WHOLE
    stream history are answerable at any time without replaying
    events. State is BOUNDED at ``keys × 2^p`` register rows
    regardless of stream length.

    Unlike the additive CMS/histogram sketches, register max-merge is
    IDEMPOTENT — a crash-redelivered batch merged twice cannot inflate
    the registers — so the ``_applied_batch`` replay guard here only
    skips the wasted state rewrite; correctness never depended on it.
    Runs with trigger=availableNow and blocks until input is drained.
    """
    from ..operators.sketches import hll_register_merge, hll_register_sketch
    from ..sources.io import write_table

    keys = keys or []

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sketch = hll_register_sketch(
            batch_df, keys, value_col, p=p, hash_impl=hash_impl
        )
        stamp = _stream_stamp(
            _checkpoint_stream_id(spark, checkpoint_dir), batch_id
        )
        if spark.catalog.tableExists(table):
            state = _replay_guarded_state(spark, table, stamp, batch_id)
            if state is None:  # this exact batch already merged
                return
            merged = hll_register_merge(
                state.unionByName(batch_sketch), keys
            )
            # the union reads the table being overwritten: materialize
            # the (bounded, register-count-sized) merge before the swap
            merged = merged.localCheckpoint(eager=True)
        else:
            merged = batch_sketch
        write_table(merged.withColumn("_applied_batch", F.lit(stamp)), table)

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_ivf_append(
    sdf: DataFrame,
    table: str,
    centroids: list[list[float]] | None = None,
    checkpoint_dir: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_name: str = "stream_ivf_append",
):
    """Streaming ANN ingest: each micro-batch of embeddings is assigned
    to its nearest EXISTING centroid and appended into the standing
    cell-partitioned IVF index
    (``operators.similarity.ivf_append_index`` — which also measures
    quantizer drift per batch; the per-batch reports are buffered and
    flushed to the ``{table}_drift_log`` companion in ONE write after
    the drain, not a 1-row write job per batch — and a mid-stream
    matrix rotation DROPS the pre-rotation buffer, since the rotation
    cleared the log and re-baselined). A PQ-coded index's persisted
    codebook companion is resolved once at stream start (and on
    resync), never per batch. The vector twin of
    :func:`stream_corpus_dedup`'s index accretion: state is the index
    table itself — restart-proof, queryable, compactable — and later
    probes (``ivf_query_index``) see old and streamed vectors alike.

    Replay idempotence comes from an id anti-join, not stamps: vector
    ids are globally unique by the ingest contract (an id IS the
    vector's identity), so a crash-redelivered batch's ids already
    exist in the index and the re-append is a no-op. This is weaker
    than the ``_src_batch`` stamp threading of the dedup streams —
    which must also exclude same-batch index rows from their probes —
    but appends have no probe step, so id uniqueness is sufficient.
    Runs with trigger=availableNow and blocks until input is drained.

    Probe cost is INDEX-SIZE-INDEPENDENT in shuffle terms: the IVF
    index is id-bucketed as well as cell-partitioned (see
    ``ivf_build_index``), so the anti-join's index side streams out of
    the bucketed layout pre-shuffled — only the micro-batch (small by
    construction) is exchanged, the same flat-probe shape as the exact
    seen-set (``dedup.exact_incremental_dedup``); SCALE.md records the
    1×/10×/40× A/B. The id-column SCAN still grows with the index, but
    scanning one sorted parquet column is cheap and creep resets at
    every ``compact_index_table``.

    ``centroids=None`` resolves the CURRENT matrix from the persisted
    ``{table}_centroids`` companion at stream start. The held matrix is
    additionally RE-CHECKED every micro-batch against the table's
    recorded fingerprint (one constant-time SHOW TBLPROPERTIES — no
    Spark job): when a maintenance ``ivf_retrain_index`` /
    ``ivf_split_hot_cells`` rotates the matrix mid-stream, the next
    batch reloads the companion and bins against the NEW cells instead
    of dying on the stale-matrix check — maintenance is non-disruptive
    to running ingests (rows are never mis-binned: the reload happens
    BEFORE assignment, and the rotation itself is stage-and-swap).
    """
    from ..operators.similarity import (
        _centroid_fingerprint,
        _drift_stats_table,
        ivf_append_drift_reports,
        ivf_append_index,
        ivf_load_centroids,
        pq_load_codebook,
    )
    from ..sources.io import get_table_meta

    if checkpoint_dir is None:
        raise ValueError("stream_ivf_append requires checkpoint_dir")
    spark0 = sdf.sparkSession
    if centroids is None:
        centroids = ivf_load_centroids(spark0, table)
    _is_grid = get_table_meta(spark0, table).get("impl") == "grid"

    def _build_stats():
        # resolve the build-time drift baseline ONCE per held matrix
        # (r17): it rotates exactly when the centroid matrix does, so
        # the fingerprint resync below is the right invalidation point
        # — reading it per batch was one fixed-cost job per micro-batch
        try:
            srow = spark0.table(_drift_stats_table(table)).first()
            if srow is not None:
                return (srow["mean_dist"], srow["p95_dist"])
        except Exception:
            pass  # pre-stats index: drift unmeasurable (same fallback
            # as ivf_append_index's own companion read)
        return (None, None)

    def _codebook():
        # resolve the PQ companion ONCE per stream (and again on
        # resync), not per batch: ivf_append_index would otherwise
        # re-collect the m x n_codes companion every micro-batch —
        # exactly the fixed per-batch overhead this path sheds
        if "pq_code" in spark0.table(table).columns:
            try:
                return pq_load_codebook(spark0, table)
            except Exception:
                raise ValueError(
                    f"{table} stores PQ codes and has no "
                    f"{table}_pq_codebook companion; streaming appends "
                    "need the persisted codebook (rebuild the index, or "
                    "pq_save_codebook the original)"
                )
        return None

    held = {
        "cents": centroids,
        "fp": _centroid_fingerprint(centroids),
        "cb": _codebook(),
        "stats": _build_stats(),
    }
    reports: list[dict] = []

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        recorded = get_table_meta(spark, table).get("centroid_fp")
        if recorded and recorded != held["fp"]:
            # maintenance rotated the quantizer since the last batch:
            # resync from the companion instead of failing the batch.
            # Buffered PRE-rotation drift reports are DROPPED — the
            # rotation already cleared the drift log and re-baselined,
            # and reports measured against the retired centroids would
            # re-arm retrain_recommended (with stale cell ids) on a
            # freshly remediated index.
            held["cents"] = ivf_load_centroids(spark, table)
            held["fp"] = _centroid_fingerprint(held["cents"])
            held["cb"] = _codebook()
            held["stats"] = _build_stats()
            reports.clear()
        existing = spark.table(table).select(F.col(id_col))
        # the replay-guard anti-join feeds ivf_append_index LAZILY: the
        # default (mllib) append consumes its input exactly once, inside
        # its own assignment checkpoint, so anti-join + nearest-cell
        # kernel fuse into ONE job per batch (r17; the r16 shape paid a
        # separate checkpoint job here because the old append body
        # executed its input twice — drop-count + assignment). Grid
        # appends still count their input, so the guard stays
        # checkpointed on that path.
        fresh = batch_df.join(existing, on=id_col, how="left_anti")
        if _is_grid:
            fresh = fresh.localCheckpoint(eager=True)
        # log_drift=False: buffer the per-batch report and flush ONE
        # companion write post-drain instead of a 1-row write job per
        # batch (see ivf_append_drift_reports for the crash story)
        reports.append(
            ivf_append_index(
                fresh,
                table,
                held["cents"],
                id_col=id_col,
                vec_col=vec_col,
                pq_codebook=held["cb"],
                log_drift=False,
                build_stats=held["stats"],
            )
        )

    q = (
        sdf.writeStream.foreachBatch(_append)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # appends ran in foreachBatch's cloned session; invalidate the
    # caller session's file-listing cache so post-drain probes see the
    # streamed rows
    sdf.sparkSession.catalog.refreshTable(table)
    _flush_ivf_drift_reports(sdf.sparkSession, table, held["fp"], reports)


def _flush_ivf_drift_reports(
    spark, table: str, held_fp: str, reports: list[dict]
) -> None:
    """Post-drain drift-log flush, fingerprint-guarded exactly like the
    per-batch resync: a rotation (maintenance retrain/split/merge from
    another session) landing between the LAST micro-batch and this
    flush would write reports measured against the retired matrix into
    the freshly cleared log, re-arming ``retrain_recommended`` with
    stale cell ids — so the buffer is dropped when the table's recorded
    fingerprint no longer matches the one the reports were measured
    against. One constant-time SHOW TBLPROPERTIES, then one write."""
    from ..operators.similarity import ivf_append_drift_reports
    from ..sources.io import get_table_meta

    recorded = get_table_meta(spark, table).get("centroid_fp")
    if recorded and recorded != held_fp:
        reports = []
    ivf_append_drift_reports(spark, table, reports)


def stream_histogram_sketch(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 256,
    query_name: str = "stream_histogram_sketch",
):
    """Streaming quantile state — the histogram member of the sketch
    trio's streaming twins (:func:`stream_frequency_sketch` =
    frequencies, HLL rollups = distincts): each micro-batch is binned
    (``operators.sketches.hist_sketch``) and merged losslessly into
    the persisted sketch table, so any-quantile-over-the-whole-history
    (``hist_quantile``) is answerable at any time without replaying
    events. State is BOUNDED at ``keys × n_bins`` rows forever; the
    (lo, hi, n_bins) range is part of the table's contract like CMS
    depth/width. Runs with trigger=availableNow and blocks."""
    from ..operators.sketches import hist_merge, hist_sketch
    from ..sources.io import write_table

    keys = keys or []

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_sketch = hist_sketch(batch_df, keys, value_col, lo, hi, n_bins)
        stamp = _stream_stamp(
            _checkpoint_stream_id(spark, checkpoint_dir), batch_id
        )
        if spark.catalog.tableExists(table):
            state = _replay_guarded_state(spark, table, stamp, batch_id)
            if state is None:  # this exact batch already merged
                return
            merged = hist_merge(
                state.unionByName(batch_sketch), keys
            ).localCheckpoint(eager=True)
        else:
            merged = batch_sketch
        write_table(merged.withColumn("_applied_batch", F.lit(stamp)), table)

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_span_dedup(
    sdf: DataFrame,
    table: str,
    sink_table: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    query_name: str = "stream_span_dedup",
):
    """Streaming exact-substring curation: every micro-batch of
    arriving documents is masked against the persisted span-fingerprint
    index (and within itself) through
    ``operators.dedup.span_incremental_dedup``, the masked batch
    appends to ``sink_table``, and the batch's unseen span fingerprints
    extend the index — so later batches dedup against everything ever
    streamed. The exact-substring sibling of
    :func:`stream_corpus_dedup` (near-dup) and
    :func:`stream_frequency_sketch` (frequencies): state lives in a
    bucketed table, not the streaming state store — restart-proof,
    queryable, compactable. ``k`` must match the
    ``span_build_index`` call that created ``table``. Runs with
    trigger=availableNow and blocks until input is drained.
    """
    from ..operators.dedup import span_incremental_dedup

    def _mask(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # stamp threading makes the whole step replay-exact: the
        # probe EXCLUDES index rows this batch stamped (so a replay
        # after the index extension doesn't mask the batch against its
        # own spans), the re-append anti-joins to a no-op, and the
        # sink lands in the batch's own partition via dynamic
        # overwrite (identical rows, never a duplicate copy). The
        # stamp is checkpoint-scoped (_stream_stamp): a fresh
        # checkpoint whose ids restart at 0 can never alias stale
        # _src_batch rows a previous stream left in a reused index.
        sid = _checkpoint_stream_id(batch_df.sparkSession, checkpoint_dir)
        masked = span_incremental_dedup(
            batch_df.sparkSession, table, batch_df,
            id_col=id_col, text_col=text_col, k=k, append=True,
            batch_id=_stream_stamp(sid, batch_id),
        )
        _land_batch_partition(masked, sink_table, batch_id, stream_id=sid)

    q = (
        sdf.writeStream.foreachBatch(_mask)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_exact_dedup(
    sdf: DataFrame,
    table: str,
    sink_table: str,
    checkpoint_dir: str,
    content_cols: list[str],
    order_col: str | None = None,
    query_name: str = "stream_exact_dedup",
):
    """Streaming EXACT seen-set curation — the URL-frontier form:
    every micro-batch of arriving rows is dropped against the
    persisted fingerprint index (and within itself, min ``order_col``
    surviving) through ``operators.dedup.exact_incremental_dedup``;
    survivors land in ``sink_table`` and their fingerprints extend the
    index, so later batches dedup against everything ever streamed.
    The exact-equality sibling of :func:`stream_corpus_dedup`
    (near-dup), :func:`stream_media_dedup` (Hamming) and
    :func:`stream_span_dedup` (substrings): state lives in a bucketed
    catalog table, not the streaming state store — restart-proof,
    queryable, compactable, and unlike ``dedup_events``'s
    dropDuplicates state it never grows a per-key state-store entry.

    Replay-exact via the same stamp threading as
    :func:`stream_span_dedup`: the probe excludes index rows this
    batch stamped (a crash-redelivered batch must not drop its own
    rows), the re-append anti-joins to a no-op, and the sink lands in
    the batch's own partition via dynamic overwrite. The stamp is
    checkpoint-scoped (:func:`_stream_stamp`), so a fresh checkpoint
    whose ids restart at 0 can never alias stale ``_src_batch`` rows.
    Runs with trigger=availableNow and blocks until input drains."""
    from ..operators.dedup import exact_incremental_dedup

    def _dedup(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sid = _checkpoint_stream_id(batch_df.sparkSession, checkpoint_dir)
        survivors = exact_incremental_dedup(
            batch_df.sparkSession, table, batch_df, content_cols,
            order_col=order_col, append=True,
            batch_id=_stream_stamp(sid, batch_id),
        )
        _land_batch_partition(survivors, sink_table, batch_id, stream_id=sid)

    q = (
        sdf.writeStream.foreachBatch(_dedup)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_frontier_schedule(
    sdf: DataFrame,
    state_table: str,
    sink_table: str,
    checkpoint_dir: str,
    directives: DataFrame | None = None,
    url_col: str = "url",
    default_delay: float = 1.0,
    order_col: str | None = None,
    priority_col: str | None = None,
    state_partitions: int = 64,
    query_name: str = "stream_frontier_schedule",
):
    """Streaming politeness scheduling — the stateful twin of
    ``operators.curation.frontier_schedule`` for a CONTINUOUS crawl:
    every micro-batch of discovered URLs gets per-domain serial fetch
    slots that CONTINUE where the previous batch stopped (state = one
    ``next_slot`` counter per domain in a hash-partitioned catalog
    table), offsets = slot × the domain's ``crawl_delay`` from
    ``directives`` (:func:`~..operators.curation.robots_directives`;
    ``default_delay`` when absent). Scheduled rows land in
    ``sink_table``'s per-batch partition.

    Replay-exact (see :func:`_frontier_schedule_merge_batch`): slots
    are recomputed from the PRE-batch counters even when a crash left
    some state partitions already advanced, so a redelivered batch
    overwrites its sink partition with identical rows and advances
    only the partitions that missed. Slot assignment within a batch is
    itself deterministic for ANY input: the rank window orders by
    (``priority_col`` DESC when given — higher priority fetches first
    within the batch, matching the batch scheduler's rank order;
    priority can never reorder slots a previous batch committed, so
    cross-batch priority means sorting the FEED), then
    (``order_col``, url, xxhash64 of every batch column), so rows
    duplicated on both explicit keys still rank identically on every
    recomputation — rows identical in every column are interchangeable
    and all others order by the hash (distinct rows colliding on all
    three is a 64-bit-hash collision, negligible). Runs with
    trigger=availableNow and blocks until input drains."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        sid = _checkpoint_stream_id(batch_df.sparkSession, checkpoint_dir)
        _frontier_schedule_merge_batch(
            batch_df, batch_id, state_table, sink_table, directives,
            url_col, default_delay, order_col,
            priority_col=priority_col,
            state_partitions=state_partitions,
            stamp=_stream_stamp(sid, batch_id), stream_id=sid,
        )

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _frontier_schedule_merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_table: str,
    sink_table: str,
    directives: DataFrame | None,
    url_col: str,
    default_delay: float,
    order_col: str | None,
    priority_col: str | None = None,
    state_partitions: int = 64,
    stamp: int | None = None,
    stream_id: str | None = None,
) -> None:
    """One :func:`stream_frontier_schedule` micro-batch, module-level
    so the crash-replay contract is directly testable. Write order and
    replay algebra:

    1. Within-batch slots (``_bslot``) and per-domain counts
       (``_bcnt``) come from one domain-keyed window.
    2. The PRE-batch base for each domain is its state ``next_slot`` —
       EXCEPT domains whose state partition already carries this
       batch's stamp (a crash between the partition-scoped state
       overwrite and the checkpoint commit): their counter already
       includes this batch, so base = ``next_slot − _bcnt``. Slots are
       therefore identical across replays regardless of which
       partitions the crash caught.
    3. The sink partition lands FIRST (dynamic overwrite — idempotent
       by construction), THEN the touched state partitions that are
       not yet stamped advance (bystander domains sharing a rewritten
       partition copy forward unchanged).

    Unlike sessionize state, the replay guard honors ONLY the exact
    stamp — no legacy bare-id window: this operator was born with
    hashed stamps (no pre-hashed state exists), and a bare-id false
    collision would not merely skip a batch but corrupt the base
    arithmetic (a partition wrongly counted "advanced by this batch"
    under-schedules every slot by the batch count)."""
    from ..operators.curation import _url_host
    from ..sources.io import (
        check_table_meta,
        get_table_meta,
        set_table_meta,
        write_table,
    )

    reserved = {
        "fetch_domain", "fetch_slot", "fetch_offset_seconds",
        "__fs_delay", "_kb", "_bslot", "_bcnt", "_base", "next_slot",
    }
    clash = [c for c in batch_df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"stream_frontier_schedule reserves columns {sorted(reserved)}:"
            f" {clash}"
        )
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    if stamp is None:
        stamp = batch_id
    from pyspark.sql import Window

    b = batch_df.withColumn("fetch_domain", _url_host(url_col))
    # tiebreak chain keeps slot assignment deterministic — replay
    # exactness requires the SAME slots on every recomputation of a
    # redelivered batch: url breaks order_col collisions, and a final
    # xxhash64 over ALL batch columns breaks (order_col, url)
    # duplicates (rows differing in any other column order by the
    # hash; rows identical in EVERY column are interchangeable, so
    # either assignment yields the same output set). Residual
    # nondeterminism needs distinct rows colliding on order_col, url
    # AND the 64-bit hash — negligible.
    all_cols_hash = F.xxhash64(*[F.col(c) for c in batch_df.columns])
    order = (
        [F.col(order_col).asc(), F.col(url_col).asc(), all_cols_hash.asc()]
        if order_col
        else [F.col(url_col).asc(), all_cols_hash.asc()]
    )
    if priority_col is not None:
        # same rank order as the batch frontier_schedule: higher
        # priority fetches first WITHIN this batch; counters still
        # continue across batches (priority can never reorder slots a
        # previous batch committed — a streaming scheduler is
        # append-only by construction, so cross-batch priority means
        # sorting the FEED, not the scheduler)
        order = [F.col(priority_col).desc()] + order
    w = Window.partitionBy("fetch_domain").orderBy(*order)
    b = (
        b.withColumn("_bslot", F.row_number().over(w) - 1)
        .withColumn("_bcnt", F.count("*").over(Window.partitionBy("fetch_domain")))
    )
    if directives is not None:
        # aggregate by LOWERED domain before the join: duplicate or
        # case-variant directive rows would otherwise multiply every
        # frontier row for that domain and hand the copies distinct
        # slots (min = least-permissive delay wins, matching
        # robots_directives' own multi-delay rule)
        b = b.join(
            directives.groupBy(
                F.lower(F.col("domain")).alias("fetch_domain")
            ).agg(F.min("crawl_delay").alias("__fs_delay")),
            "fetch_domain",
            "left",
        )
    else:
        b = b.withColumn("__fs_delay", F.lit(None).cast("double"))
    delay = F.coalesce(F.col("__fs_delay"), F.lit(float(default_delay)))
    bucket = F.pmod(F.xxhash64(F.col("fetch_domain")), F.lit(state_partitions))
    b = b.withColumn("_kb", bucket).localCheckpoint(eager=True)

    exists = spark.catalog.tableExists(state_table)
    done_kb: set = set()
    if exists:
        meta = get_table_meta(spark, state_table)
        if "state_partitions" in meta:
            check_table_meta(spark, state_table, state_partitions=state_partitions)
        else:
            set_table_meta(spark, state_table, state_partitions=state_partitions)
        state = spark.table(state_table)
        touched_kb = sorted(r[0] for r in b.select("_kb").distinct().collect())
        # the replay guard honors ONLY the exact stamp — no legacy
        # bare-id window: this operator is new with hashed stamps, so
        # no pre-hashed state exists to honor, and a bare-id false
        # collision would not merely skip (as in sessionize) but
        # corrupt the base arithmetic below (a partition wrongly
        # counted "advanced by this batch" computes base =
        # next_slot − count and under-schedules every slot)
        done_kb = {
            r[0]
            for r in state.filter(
                F.col("_kb").isin(touched_kb)
                & (F.col("_applied_batch") == stamp)
            ).select("_kb").distinct().collect()
        }
        # batch domains can only live in touched buckets: filtering
        # first turns the base join's state side into a
        # partition-pruned scan of ≤len(touched_kb) partitions instead
        # of a full-table shuffle per micro-batch (at web scale the
        # state is domain-count-sized; the batch is not)
        joined = b.join(
            state.filter(F.col("_kb").isin(touched_kb)).select(
                "fetch_domain", "next_slot"
            ),
            "fetch_domain",
            "left",
        )
        ns = F.coalesce(F.col("next_slot"), F.lit(0))
        # stamped partitions already include this batch in the counter
        base = F.when(
            F.col("_kb").isin(sorted(done_kb)) if done_kb else F.lit(False),
            ns - F.col("_bcnt"),
        ).otherwise(ns)
        joined = joined.withColumn("_base", base).drop("next_slot")
    else:
        meta = {}
        joined = b.withColumn("_base", F.lit(0).cast("bigint"))
    slot = (F.col("_base") + F.col("_bslot")).cast("bigint")
    sched = joined.select(
        *[c for c in batch_df.columns],
        "fetch_domain",
        slot.alias("fetch_slot"),
        F.round(slot * delay, 6).alias("fetch_offset_seconds"),
        "_kb",
        "_bcnt",
        "_base",
    ).localCheckpoint(eager=True)
    _land_batch_partition(
        sched.drop("_kb", "_bcnt", "_base"), sink_table, batch_id,
        stream_id=stream_id,
    )

    adv = (
        sched.groupBy("fetch_domain", "_kb")
        .agg((F.first("_base") + F.first("_bcnt")).alias("next_slot"))
    )
    if not exists:
        out = adv.withColumn("_applied_batch", F.lit(stamp).cast("bigint"))
        write_table(
            out.select("fetch_domain", "next_slot", "_applied_batch", "_kb"),
            state_table,
            partition_by=["_kb"],
        )
        set_table_meta(
            spark, state_table,
            state_partitions=state_partitions,
        )
        return
    todo_kb = [k for k in touched_kb if k not in done_kb]
    if not todo_kb:
        return
    adv_todo = adv.filter(F.col("_kb").isin(todo_kb))
    pstate = spark.table(state_table).filter(F.col("_kb").isin(todo_kb))
    bystanders = pstate.join(
        F.broadcast(adv_todo.select("fetch_domain")), "fetch_domain", "leftanti"
    ).drop("_applied_batch")
    out = (
        bystanders.select("fetch_domain", "next_slot", "_kb")
        .unionByName(adv_todo.select("fetch_domain", "next_slot", "_kb"))
        .withColumn("_applied_batch", F.lit(stamp).cast("bigint"))
        .select("fetch_domain", "next_slot", "_applied_batch", "_kb")
        .localCheckpoint(eager=True)
    )
    _dynamic_partition_overwrite(out, state_table, "_kb")


def stream_crawl_tick(
    sdf: DataFrame,
    seen_table: str,
    frontier_state_table: str,
    fetched_table: str,
    checkpoint_dir: str,
    robots_df: DataFrame | None = None,
    content_col: str = "sitemap_xml",
    url_col: str = "url",
    order_col: str = "doc_id",
    default_delay: float = 1.0,
    priority_col: str | None = None,
    canonicalize: bool = True,
    seen_buckets: int = 32,
    state_partitions: int = 64,
    query_name: str = "stream_crawl_tick",
):
    """The CONTINUOUS form of ``operators.curation.crawl_tick``: every
    micro-batch of fetched sitemap payloads runs the full crawl tick —
    sitemap discovery → URL canonicalization → RFC 9309 robots filter
    → standing exact seen-set probe+advance → fetch-sim → politeness
    scheduling continuing the per-domain counters — and lands in
    ``fetched_table``'s own batch partition. One checkpoint drives the
    WHOLE tick: both state advances (seen-set fingerprints, frontier
    counters) carry the same checkpoint-scoped stamp
    (:func:`_stream_stamp`), so a crash anywhere mid-tick redelivers
    the batch and replays it byte-identically — the composed guarantee
    the per-operator streaming twins (:func:`stream_exact_dedup`,
    :func:`stream_frontier_schedule`) each pin individually.

    ``robots_df`` is static per the streaming contract (rules change →
    restart the query; a stream-joined rules table would race the
    batch boundary). Runs with trigger=availableNow and blocks until
    input drains."""
    from ..operators.curation import _crawl_tick_apply

    def _tick(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sid = _checkpoint_stream_id(batch_df.sparkSession, checkpoint_dir)
        _crawl_tick_apply(
            batch_df.sparkSession, batch_df, batch_id,
            seen_table=seen_table,
            frontier_state_table=frontier_state_table,
            fetched_table=fetched_table,
            robots_df=robots_df, content_col=content_col,
            url_col=url_col, order_col=order_col,
            default_delay=default_delay, priority_col=priority_col,
            canonicalize=canonicalize,
            seen_buckets=seen_buckets, state_partitions=state_partitions,
            stamp=_stream_stamp(sid, batch_id), stream_id=sid,
        )

    q = (
        sdf.writeStream.foreachBatch(_tick)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _fuse_intervals(intervals: DataFrame, key_col: str, gap_us: int) -> DataFrame:
    """Fuse per-key session intervals whose inter-interval gap is at
    most ``gap_us``: running-max end (not lag — out-of-order batches
    can nest intervals) marks the break points, a running sum of
    breaks groups them, one agg collapses each group. The session
    partition of a point set is UNIQUE (split exactly where
    consecutive gaps exceed the threshold) and adding points never
    widens a gap, so interval fusion is exact — not an approximation
    of batch sessionization."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("start_us", "end_us")
    prev_end = F.max("end_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (
        prev_end.isNull() | ((F.col("start_us") - prev_end) > gap_us)
    ).cast("int")
    grp = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        intervals.withColumn("_g", grp)
        .groupBy(key_col, "_g")
        .agg(
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("_g")
    )


def stream_sessionize(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    query_name: str = "stream_sessionize",
    state_partitions: int = 64,
):
    """Incremental sessionization — the streaming twin of
    ``operators.windows.sessionize``: each micro-batch rolls to per-key
    session INTERVALS ``(start_us, end_us, n_events)`` that merge into
    a persisted session table, fusing with stored sessions when the
    boundary gap is within ``gap_seconds``. ORDER-INSENSITIVE by
    construction (see :func:`_fuse_intervals`): late or out-of-order
    batches land inside / fuse onto the right session, so the table
    always equals batch sessionization of everything streamed —
    regardless of how events were split across batches.

    PARTITION-SCOPED state rewrites (round 9): the state table is
    hash-partitioned on ``pmod(xxhash64(key), state_partitions)``, and
    each batch rewrites ONLY the partitions holding its keys via
    dynamic partition overwrite — per-batch cost is O(touched
    partitions), never O(total state), the same COW discipline the
    versioned table's merge uses. Within touched partitions, only keys
    PRESENT in the batch pass through the fuse window; bystander keys'
    rows are copied forward unchanged. State is one row per session —
    it COMPACTS as sessions fuse, and grows only with genuinely new
    sessions.

    CRASH-REPLAY IDEMPOTENT per partition: every rewritten partition
    is stamped with the batch id it applied (``_applied_batch``,
    atomic with the partition's data), and a redelivered batch id
    skips exactly the partitions already stamped — so a crash anywhere
    between the sink write and the checkpoint commit never
    double-counts ``n_events``. Source-level redelivery (the same
    EVENT arriving under a new batch id) is still additive: an
    at-least-once source must dedup upstream (:func:`dedup_events`).

    Read the table back through :func:`session_table_stats` for the
    same (session_index, start, end, duration) shape the batch
    ``session_stats`` emits. Runs with trigger=availableNow and blocks.
    """
    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stamp = _stream_stamp(
            _checkpoint_stream_id(batch_df.sparkSession, checkpoint_dir),
            batch_id,
        )
        _sessionize_merge_batch(
            batch_df, batch_id, table, key_col, ts_col, gap_seconds,
            state_partitions=state_partitions, stamp=stamp,
        )

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _sessionize_merge_batch(
    batch_df: DataFrame,
    batch_id: int,
    table: str,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    state_partitions: int = 64,
    stamp: int | None = None,
) -> None:
    """One :func:`stream_sessionize` micro-batch, exposed at module
    level so the crash-replay contract is directly testable: firing the
    SAME batch id twice must leave the state table unchanged, and a
    batch must rewrite only the state partitions its keys hash into.
    ``stamp`` is the checkpoint-scoped replay stamp (defaults to the
    bare batch id for direct batch-mode calls; the streaming wrapper
    always passes :func:`_stream_stamp`).

    The state table's partition modulus is part of its physical
    contract: a key's state row lives in the partition the modulus in
    force AT WRITE TIME hashed it into, so probing with a different
    ``state_partitions`` would silently miss existing rows and accrue
    duplicate sessions. The modulus is therefore recorded in table
    metadata at creation and VALIDATED on every batch — a mismatch
    raises instead of corrupting (tables from before the metadata
    existed adopt the caller's value on first contact, which is only
    safe if the caller kept it constant — documented caveat)."""
    from ..operators.windows import sessionize
    from ..sources.io import check_table_meta, get_table_meta, set_table_meta, write_table

    if batch_df.isEmpty():
        return
    if stamp is None:
        stamp = batch_id
    gap_us = gap_seconds * 1_000_000
    spark = batch_df.sparkSession
    if spark.catalog.tableExists(table):
        # LEGACY state tables (pre-stamp-upgrade) carry a 32-bit
        # _applied_batch column: the partition-scoped write below is a
        # positional insertInto, so a 64-bit hashed stamp would fail
        # ANSI store assignment (or silently truncate under LEGACY
        # policy, breaking the replay guard). Those tables keep their
        # original bare-batch-id guard semantics; tables created by
        # this version stamp bigint from birth.
        fields = {
            f.name: f.dataType.simpleString()
            for f in spark.table(table).schema.fields
        }
        if fields.get("_applied_batch") == "int":
            stamp = batch_id
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(state_partitions))
    s = sessionize(
        batch_df.select(key_col, ts_col), key_col, ts_col, gap_seconds
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    batch_iv = s.groupBy(key_col, "session_index").agg(
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.count("*").alias("n_events"),
    ).drop("session_index")
    # materialized once: the touched-bucket collect, the replay probe
    # and the fuse each ACTION on batch_iv — without this the per-batch
    # sessionize window re-runs per action (batch-sized, cheap to pin)
    batch_iv = batch_iv.localCheckpoint(eager=True)

    if not spark.catalog.tableExists(table):
        merged = (
            _fuse_intervals(batch_iv, key_col, gap_us)
            .withColumn("_applied_batch", F.lit(stamp).cast("bigint"))
            .withColumn("_kb", bucket)
        )
        write_table(merged, table, partition_by=["_kb"])
        set_table_meta(
            spark,
            table,
            state_partitions=state_partitions,
            # stamp_mode records whether this table has ever been
            # written with hashed (checkpoint-scoped) stamps; the
            # replay guard only honors legacy bare batch ids while
            # this says otherwise (see the upgrade-window note below)
            stamp_mode="hashed" if stamp != batch_id else "bare",
        )
        return

    state = spark.table(table)
    if "_kb" not in state.columns:
        # legacy unpartitioned state (pre-round-9 layout): full
        # stage-and-swap rewrite with the whole-table replay stamp
        state = _replay_guarded_state(spark, table, stamp, batch_id)
        if state is None:  # this exact batch already applied
            return
        touched_keys = batch_iv.select(key_col).distinct()
        touched = state.join(F.broadcast(touched_keys), key_col, "leftsemi")
        untouched = state.join(F.broadcast(touched_keys), key_col, "leftanti")
        fused = _fuse_intervals(touched.unionByName(batch_iv), key_col, gap_us)
        merged = untouched.unionByName(fused).localCheckpoint(eager=True)
        write_table(merged.withColumn("_applied_batch", F.lit(stamp)), table)
        return

    # raises on a state_partitions mismatch with the recorded physical
    # modulus (silent mis-bucketing would duplicate sessions); tables
    # from before the metadata adopt the caller's value here
    meta = get_table_meta(spark, table)
    if "state_partitions" in meta:
        check_table_meta(spark, table, state_partitions=state_partitions)
    else:
        set_table_meta(spark, table, state_partitions=state_partitions)

    batch_iv = batch_iv.withColumn("_kb", bucket)
    # touched partitions: bounded by state_partitions, tiny collect
    touched_kb = sorted(
        r[0] for r in batch_iv.select("_kb").distinct().collect()
    )
    # per-partition replay guard: a partition already stamped with this
    # batch's stamp was fully rewritten before the crash — skip exactly
    # it. A legacy bare-batch-id stamp (bigint state written by
    # pre-hashed-stamp code) is honored ONLY while the table's
    # stamp_mode metadata says it predates hashed stamps — the
    # one-batch upgrade window where a batch applied pre-upgrade can
    # be crash-redelivered post-upgrade (its n_events would double).
    # The flag flips to 'hashed' on the first successful post-upgrade
    # write below, closing the window: without the gate, a state
    # table reused under a NEW checkpoint (batch ids restart at 0)
    # whose untouched partitions still carry bare stamps would
    # forever skip colliding batch ids and silently drop events
    honor_bare = stamp != batch_id and meta.get("stamp_mode") != "hashed"
    guard = F.col("_applied_batch") == stamp
    if honor_bare:
        guard = guard | (F.col("_applied_batch") == batch_id)
    done_kb = {
        r[0]
        for r in state.filter(
            F.col("_kb").isin(touched_kb) & guard
        ).select("_kb").distinct().collect()
    }
    if honor_bare and done_kb:
        # close the window ON THE SKIP PATH too: partitions whose
        # guard hit was the legacy BARE id get restamped with the
        # hashed stamp (rows otherwise unchanged), then the flag
        # flips. Without this, a batch fully skipped by bare-id
        # collisions would return before the post-write flip and the
        # "one-batch" window could stay open indefinitely (repeating
        # the new-checkpoint drop on every restart); restamping —
        # rather than only flipping the flag — keeps a crash-refire
        # of a GENUINE cross-upgrade redelivery idempotent (the
        # refire skips via the hashed stamp instead of re-applying).
        legacy_kb = sorted(
            r[0]
            for r in state.filter(
                F.col("_kb").isin(sorted(done_kb))
                & (F.col("_applied_batch") == batch_id)
                & (F.col("_applied_batch") != stamp)
            ).select("_kb").distinct().collect()
        )
        if legacy_kb:
            restamped = (
                state.filter(F.col("_kb").isin(legacy_kb))
                .withColumn("_applied_batch", F.lit(stamp).cast("bigint"))
                .localCheckpoint(eager=True)
            )
            _dynamic_partition_overwrite(restamped, table, "_kb")
        set_table_meta(spark, table, stamp_mode="hashed")
        meta = {**meta, "stamp_mode": "hashed"}
    todo_kb = [b for b in touched_kb if b not in done_kb]
    if not todo_kb:
        return
    pstate = state.filter(F.col("_kb").isin(todo_kb)).drop("_applied_batch")
    biv = batch_iv.filter(F.col("_kb").isin(todo_kb))
    touched_keys = biv.select(key_col).distinct()
    fuse_rows = pstate.join(F.broadcast(touched_keys), key_col, "leftsemi")
    # bystander keys share a rewritten partition but weren't in the
    # batch: copied forward unchanged (no window over them)
    bystanders = pstate.join(F.broadcast(touched_keys), key_col, "leftanti")
    fused = _fuse_intervals(
        fuse_rows.drop("_kb").unionByName(biv.drop("_kb")), key_col, gap_us
    ).withColumn("_kb", bucket)
    out = bystanders.unionByName(fused).withColumn(
        "_applied_batch", F.lit(stamp)
    )
    # the plan reads the table being overwritten: materialize first
    # (touched-partitions-sized, not total-state-sized)
    out = out.localCheckpoint(eager=True)
    _dynamic_partition_overwrite(out, table, "_kb")
    if stamp != batch_id and meta.get("stamp_mode") != "hashed":
        # first successful hashed-stamp write: close the legacy
        # bare-id upgrade window for every future batch
        set_table_meta(spark, table, stamp_mode="hashed")


def session_table_stats(spark: SparkSession, table: str, key_col: str = "user_id") -> DataFrame:
    """Session-grain view over a :func:`stream_sessionize` state table,
    shaped exactly like the batch ``session_stats``: 1-based
    ``session_index`` per key (by start time — session numbering is a
    read-time concern, so late fusions never renumber state on disk),
    event count, start/end timestamps and 6-dp duration."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("start_us")
    t = spark.table(table)
    return t.select(
        F.col(key_col),
        F.row_number().over(w).cast("bigint").alias("session_index"),
        F.col("n_events"),
        F.timestamp_micros("start_us").alias("session_start"),
        F.timestamp_micros("end_us").alias("session_end"),
        F.round((F.col("end_us") - F.col("start_us")) / 1_000_000.0, 6).alias(
            "duration_seconds"
        ),
    )


def stream_quarantine(
    sdf: DataFrame,
    good_table: str,
    quarantine_table: str,
    checkpoint_dir: str,
    rules,
    query_name: str = "stream_quarantine",
):
    """Streaming dead-letter routing: every micro-batch splits through
    ``plans.dq.quarantine_split`` — clean rows append to
    ``good_table``, violators (with their sorted ``_dq_failed`` rule
    list) to ``quarantine_table``. The pipeline keeps flowing under
    bad input instead of failing the job or silently dropping rows,
    and the quarantine side stays queryable for triage/replay.

    Per batch: one shared projection, two writes — no shuffle.
    CRASH-REPLAY IDEMPOTENT: both sinks are partitioned by
    ``_batch_id`` and each batch lands via DYNAMIC partition overwrite,
    so a batch redelivered after a crash-before-checkpoint overwrites
    its own partition with identical rows instead of appending a
    duplicate copy — exactly-once at the batch level without a merge.
    (Batch-id partitioning also gives the dead-letter side natural
    batch-grain triage/replay and compaction units at scale.)"""
    def _route(batch_df: DataFrame, batch_id: int) -> None:
        sid = _checkpoint_stream_id(batch_df.sparkSession, checkpoint_dir)
        _quarantine_route_batch(
            batch_df, batch_id, good_table, quarantine_table, rules,
            stream_id=sid,
        )

    q = (
        sdf.writeStream.foreachBatch(_route)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _quarantine_route_batch(
    batch_df: DataFrame,
    batch_id: int,
    good_table: str,
    quarantine_table: str,
    rules,
    stream_id: str | None = None,
) -> None:
    """One :func:`stream_quarantine` micro-batch, exposed at module
    level so the crash-replay contract is directly testable: each
    batch lands in its own ``_batch_id`` partition via DYNAMIC
    partition overwrite (:func:`_land_batch_partition`), so re-firing
    a batch id replaces that partition with identical rows — both
    sinks byte-stable under replay. ``stream_id`` scopes that
    overwrite to the owning checkpoint (see
    :func:`_land_batch_partition` — a fresh checkpoint's batch 0 must
    not replace an old stream's partition 0)."""
    from ..plans.dq import quarantine_split

    if batch_df.isEmpty():
        return
    good, bad = quarantine_split(batch_df, rules)
    _land_batch_partition(good, good_table, batch_id, stream_id=stream_id)
    _land_batch_partition(bad, quarantine_table, batch_id, stream_id=stream_id)


def stream_incremental_distinct(
    sdf: DataFrame,
    table: str,
    checkpoint_dir: str,
    cols: list[str],
    query_name: str = "stream_incremental_distinct",
    state_buckets: int | None = 32,
):
    """Streaming DISTINCT state: the persisted table accumulates the
    distinct ``cols`` tuples seen across the whole stream — each
    micro-batch dedups itself, anti-joins the standing table, and
    APPENDS only genuinely new tuples (never a rewrite — the
    append-only little sibling of the minhash/ER index tables). Any
    distinct-pairs rollup (weekly actives, cohort retention, reach)
    then reads the state table instead of replaying the stream.

    Per batch: one batch-sized distinct + one anti-join against the
    state. The state table is hash-BUCKETED on the tuple key
    (``state_buckets``, default 32; None disables) so the bucketed
    scan already satisfies the anti-join's partitioning — the
    steady-state cost per batch is shuffling the BATCH to the bucket
    count, never re-shuffling the ever-growing state side (the term
    that would otherwise dominate as state approaches corpus size).
    State grows only with NEW tuples — redelivered or repeated events
    are absorbed by the anti-join, making the sink idempotent at the
    tuple level. Runs with trigger=availableNow and blocks."""
    import re

    from ..sources.io import get_table_meta, set_table_meta, write_table

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fresh = batch_df.select(*cols).distinct()
        if spark.catalog.tableExists(table):
            # the bucket spec is FIXED at table creation: appends must
            # reuse the table's actual bucket count, IGNORING the
            # caller's state_buckets — a caller restarting with a
            # different value would otherwise fail every batch with a
            # bucket-spec mismatch. Recorded in table metadata at
            # creation; tables from before the metadata fall back to
            # parsing the DDL ("INTO n BUCKETS"), and legacy
            # pre-bucketing tables keep appending unbucketed.
            n = get_table_meta(spark, table).get("state_buckets")
            if n is None:
                ddl = spark.sql(f"SHOW CREATE TABLE {table}").first()[0]
                m = re.search(r"INTO (\d+) BUCKETS", ddl)
                n = m.group(1) if m and "CLUSTERED BY" in ddl else "0"
            bb = (int(n), list(cols)) if int(n) else None
            fresh = fresh.join(spark.table(table), cols, "left_anti")
            write_table(fresh, table, mode="append", bucket_by=bb)
        else:
            bucket_by = (state_buckets, list(cols)) if state_buckets else None
            write_table(fresh, table, bucket_by=bucket_by)
            set_table_meta(spark, table, state_buckets=state_buckets or 0)

    q = (
        sdf.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
