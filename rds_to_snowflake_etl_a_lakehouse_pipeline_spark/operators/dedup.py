"""Deduplication operators for LLM-training-data pipelines.

Four tiers, all pure Catalyst expressions (higher-order functions, no
Python UDFs) so they run JVM-side at 100 TB:

- exact:        content fingerprint → one shuffle, keep deterministic row
- MinHash-LSH:  shingle → k-permutation minhash → banded buckets →
                bucket-join (NEVER all-pairs) → signature-estimated Jaccard
- SimHash:      64-bit sign-sum sketch → prefix buckets → hamming filter
- n-gram Jaccard: exact set similarity on candidate pairs via shingle
                inverted-index join (document-frequency-capped for skew)

Scale notes: every candidate generation step is a hash-partitioned join
on a bucket key. Hot buckets (boilerplate shingles) are capped with
``max_df``; AQE skew-join splitting handles the rest. The all-pairs
variants simply don't exist here by construction.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import (
    ensure_parallelism as _ensure_parallelism,
)


def _materialize(df: DataFrame, storage: str, eager: bool = True) -> DataFrame:
    """Materialize an intermediate so downstream consumers reuse its
    blocks instead of recomputing.

    ``storage="checkpoint"``: ``localCheckpoint`` — truncates lineage
    (iterative plans stay flat) and its blocks are released by the
    context cleaner on GC, but they are NOT recomputable: losing an
    executor (spot/preemptible nodes, dynamic-allocation downscale)
    fails the job.

    ``storage="persist"``: ``persist(MEMORY_AND_DISK)`` — lineage is
    retained, so lost blocks are recomputed and the job survives
    executor loss; the durable choice for preemptible clusters. Costs:
    iterative callers' plans grow with rounds (bounded by ``max_iter``),
    and blocks occupy executor storage until ``unpersist()`` (iterative
    callers here unpersist each superseded round; the final result's
    blocks are released when the caller drops the DataFrame).

    ``storage="table"``: write to a catalog stage table
    (``sg_stage_<uuid>``) and read it back — the only strategy that
    survives a FULL job/driver restart, not just executor loss: a
    restarted job can resume from the written stage instead of
    recomputing (long multi-stage curation jobs on preemptible
    infrastructure). Costs a full write+read round trip per
    materialization; stage tables persist until dropped — iterative
    callers leave one per round, so reserve it for the coarse
    per-batch materializations (signatures, hit sets, survivors) and
    clean up with ``DROP TABLE sg_stage_*`` when the job retires.
    """
    if storage == "checkpoint":
        return df.localCheckpoint(eager=eager)
    if storage == "persist":
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            df.count()
        return df
    if storage == "table":
        import uuid

        name = f"sg_stage_{uuid.uuid4().hex[:12]}"
        df.write.mode("errorifexists").format("parquet").saveAsTable(name)
        return df.sparkSession.table(name)
    raise ValueError(
        f"unknown storage strategy: {storage!r} (checkpoint|persist|table)"
    )


def cleanup_stage_tables(spark) -> list[str]:
    """Drop every ``sg_stage_*`` table the ``storage="table"``
    materialization strategy left behind (:func:`_materialize`) —
    run when a job retires; stage tables exist precisely so they
    SURVIVE restarts, so nothing drops them automatically. Returns the
    dropped table names."""
    dropped = []
    for t in spark.catalog.listTables():
        if t.name.startswith("sg_stage_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            dropped.append(t.name)
    return dropped


def _shingles(text: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string> (distinct)."""
    tokens = F.split(F.trim(text), r"\s+")
    count = F.size(tokens) - F.lit(n - 1)
    # sequence(1, 0) counts DOWN to [1, 0] — guard short docs explicitly
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    )


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Keep exactly one row per distinct content (md5 over an injective
    length-prefixed encoding → collision-safe in practice). Deterministic:
    the kept row is the min of ``order_col`` (or the first content
    column). One shuffle on the fingerprint — at 100 TB this is the
    cheapest possible exact dedup (hash-partitioned, map-side combine on
    the window).

    The encoding maps NULL to the bare token ``"N"`` and a value v to
    ``"<len(v)>:<v>"`` — a prefix code, so (``'a'``, NULL) vs (NULL,
    ``'a'``) and (``'a\\x00b'``,) vs (``'a'``, ``'b'``) all fingerprint
    differently (plain ``concat_ws`` silently skips NULLs and lets
    separator-containing values collide).
    """
    fp = _exact_fingerprint(content_cols)
    order = order_col or content_cols[0]
    w = Window.partitionBy(fp).orderBy(F.col(order).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _exact_fingerprint(content_cols: list[str]) -> Column:
    """md5 over the injective length-prefixed encoding documented on
    :func:`exact_dedup` — shared by the one-shot dedup and the
    standing seen-set index so both produce the identical key."""
    enc = [
        F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            )
        )
        for c in content_cols
    ]
    return F.md5(F.concat(*enc))


def exact_build_index(
    df: DataFrame,
    table: str,
    content_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Write the standing SEEN-SET for exact dedup: the distinct
    content fingerprints of ``df`` as a catalog table hash-bucketed on
    ``fp`` — the exact-equality member of the standing-index family
    (MinHash :func:`minhash_build_index`, Hamming
    ``multimodal.hamming_index_build``, spans
    :func:`span_build_index`). The crawl-tier use is the URL frontier:
    canonicalize arriving URLs, dedup each batch against every URL
    ever fetched, never re-scan the corpus.

    The probe is a fingerprint anti-join: the index side streams out
    of its bucketed layout pre-shuffled, so per-batch cost tracks the
    BATCH. One md5 per row, no skew (fingerprints are uniform by
    construction). A DIGEST of ``content_cols`` is recorded in table
    metadata and validated on every probe — a column-list mismatch
    would silently fingerprint different content and nothing would
    ever match. (The digest, not the raw list: Spark's property
    redaction masks read-back values matching ``(?i)url`` etc., and
    'url' is exactly the column a frontier index keys on.)"""
    from ..sources.io import set_table_meta, write_table

    fps = df.select(
        _exact_fingerprint(content_cols).alias("fp"),
        # provenance stamp for replay-exact streaming appends (see
        # exact_incremental_dedup's batch_id); build rows carry NULL
        F.lit(None).cast("bigint").alias("_src_batch"),
    ).distinct()
    write_table(fps, table, bucket_by=(n_buckets, ["fp"]))
    set_table_meta(
        df.sparkSession,
        table,
        kind="exact",
        n_buckets=n_buckets,
        bucket_cols="fp",
        content_sig=_content_cols_sig(content_cols),
    )


def _content_cols_sig(content_cols: list[str]) -> str:
    import hashlib

    return hashlib.md5(",".join(content_cols).encode()).hexdigest()


def exact_incremental_dedup(
    spark,
    table: str,
    new_df: DataFrame,
    content_cols: list[str],
    order_col: str | None = None,
    append: bool = True,
    n_buckets: int | None = None,
    storage: str = "checkpoint",
    batch_id: int | None = None,
) -> DataFrame:
    """Drop new rows whose exact content was ALREADY SEEN — by the
    indexed corpus or by an earlier row of the same batch (min
    ``order_col`` survives, matching :func:`exact_dedup`) — then
    (``append=True``) add the survivors' fingerprints so the next
    batch dedups against everything that came before. The exact twin
    of :func:`minhash_incremental_dedup`: each batch pays one md5 per
    row, one within-batch window, and one anti-join against the
    bucketed index; the index is never re-scanned.

    Survivors are MATERIALIZED before the append (``storage`` as in
    :func:`_materialize`) — a lazy survivor plan re-read after the
    append would find its own fingerprints in the index and drop every
    row as a duplicate of itself (the same hazard the Hamming index
    documents).

    ``batch_id`` makes the step REPLAY-EXACT for streaming callers
    (:func:`~..streaming.events.stream_exact_dedup`), the same stamp
    threading as ``span_incremental_dedup``: appended fingerprints
    carry the stamp in ``_src_batch``, the probe EXCLUDES index rows
    this batch stamped (a crash-redelivered batch must not drop its
    own rows as dups of themselves), and the append anti-joins
    against the current fingerprint set so a replay re-appends
    nothing. Pass the checkpoint-scoped ``_stream_stamp``, never a
    bare micro-batch id."""
    from ..sources.io import check_table_meta, write_table

    meta = check_table_meta(
        spark,
        table,
        content_sig=_content_cols_sig(content_cols),
        n_buckets=n_buckets,
    )
    if n_buckets is None:
        n_buckets = int(meta.get("n_buckets", 32))
    if "_fp" in new_df.columns:
        raise ValueError(
            "exact_incremental_dedup reserves the '_fp' column; rename it"
        )
    batch = new_df.withColumn("_fp", _exact_fingerprint(content_cols))
    order = order_col or content_cols[0]
    w = Window.partitionBy("_fp").orderBy(F.col(order).asc())
    self_kept = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    idx = spark.table(table)
    probe_idx = idx
    if batch_id is not None and "_src_batch" in idx.columns:
        probe_idx = idx.filter(
            F.col("_src_batch").isNull() | (F.col("_src_batch") != batch_id)
        )
    survivors = _materialize(
        self_kept.join(probe_idx, self_kept["_fp"] == probe_idx["fp"], "left_anti"),
        storage,
    )
    if append:
        # the replay anti-join stays LAZY and runs inside the append
        # write job itself (r17): its index scan snapshots the file set
        # at plan time, append mode may read the destination table (only
        # overwrite forbids it), and `survivors` is already materialized
        # — so fusing saves one full checkpoint pass per batch, which in
        # the crawl-tick / seen-set steady states is pure fixed cost
        new_fps = (
            survivors.select(F.col("_fp").alias("fp"))
            .join(idx.select("fp"), "fp", "left_anti")
            .withColumn("_src_batch", F.lit(batch_id).cast("bigint"))
        )
        write_table(
            new_fps, table, mode="append", bucket_by=(n_buckets, ["fp"])
        )
    return survivors.drop("_fp")


def minhash_signature(
    text: Column, num_hashes: int = 64, shingle_n: int = 3
) -> Column:
    """array<bigint> minhash signature, pure Catalyst: for seed i, min
    over shingles of xxhash64(i, shingle). Empty shingle sets get NULL.

    Reference semantics only — this expands to num_hashes interpreted
    higher-order passes over the shingle array (~60× slower than
    :func:`minhash_signature_arrow`); use the Arrow path in pipelines.
    """
    sh = _shingles(text, shingle_n)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
    )
    return F.when(F.size(sh) > 0, sig)


def _minhash_signature_udf(
    num_hashes: int, shingle_n: int, seed: int, hash_impl: str = "crc32"
):
    """Vectorized (Arrow batch) minhash straight from text.

    Tokenize (``\\s+`` split, same as :func:`_shingles`), build distinct
    word n-gram shingles, hash each with crc32 (C-speed, deterministic),
    then apply the 2-universal family h_i(x) = a_i·x + b_i (mod 2⁶⁴,
    natural uint64 wrap) and take per-row minima — one
    (num_hashes × total_shingles) outer multiply-add per Arrow batch
    with segment minima via ``minimum.reduceat``. The pure-Catalyst
    :func:`minhash_signature` needs num_hashes interpreted higher-order
    passes instead (~60× slower measured at sf0.01).

    ``hash_impl="md5"`` (round 14) swaps every engine-opaque piece for
    md5-derived arithmetic so the WHOLE signature is replayable by any
    ANSI engine (the CMS/simhash/LSH family pattern): base hash x =
    first 8 md5 hex chars of the shingle (32-bit, crc32's range),
    coefficients a_i = md5("a:seed:i") first 15 hex | 1 (60-bit odd)
    and b_i = md5("b:seed:i") first 15 hex, and the mix keeps only the
    LOW 63 BITS ((a·x+b) mod 2⁶³ — (v mod 2⁶⁴) & (2⁶³−1) ≡ v mod 2⁶³,
    so numpy's natural uint64 wrap plus a mask equals DuckDB's HUGEINT
    modulo), keeping every value signed-positive in both engines. The
    crc32 default stays the scale path.
    """
    import re

    if hash_impl == "md5":
        import hashlib

        def _h15(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        a = np.array(
            [_h15(f"a:{seed}:{i}") | 1 for i in range(num_hashes)],
            dtype=np.uint64,
        )
        b = np.array(
            [_h15(f"b:{seed}:{i}") for i in range(num_hashes)],
            dtype=np.uint64,
        )

        def base_hash(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        mask = np.uint64((1 << 63) - 1)
    elif hash_impl == "crc32":
        import zlib

        rng = np.random.default_rng(seed)
        a = (rng.integers(1, 2**62, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
        base_hash = lambda s: zlib.crc32(s.encode())  # noqa: E731
        mask = None
    else:
        raise ValueError(f"unknown hash_impl: {hash_impl!r}")
    ws = re.compile(r"\s+")

    @pandas_udf("array<bigint>")
    def sig(texts: pd.Series) -> pd.Series:
        lens, flat = [], []
        for t in texts:
            if t is None or not t.strip():
                lens.append(0)
                continue
            toks = ws.split(t.strip())
            sh = {
                " ".join(toks[i : i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            }
            if not sh:
                lens.append(0)
                continue
            flat.extend(base_hash(s) for s in sh)
            lens.append(len(sh))
        if not flat:
            return pd.Series([None] * len(texts))
        lens_arr = np.array(lens)
        hv = np.asarray(flat, dtype=np.uint64)
        # Explicit out= buffers: the naive broadcast expression
        # a[:,None]*hv[None,:]+b[:,None] routes uint64 through numpy's
        # slow generic loop (measured 5.6 s vs 0.06 s for this exact
        # computation at 260k shingles); multiply/add into a
        # preallocated array is ~90x faster and bit-identical.
        mixed = np.empty((len(a), hv.size), dtype=np.uint64)
        with np.errstate(over="ignore"):
            np.multiply(a[:, None], hv[None, :], out=mixed)
            np.add(mixed, b[:, None], out=mixed)
        if mask is not None:
            np.bitwise_and(mixed, mask, out=mixed)
        offsets = np.concatenate(([0], np.cumsum(lens_arr[lens_arr > 0])[:-1]))
        mins = np.minimum.reduceat(mixed, offsets, axis=1).astype(np.int64)
        out, j = [], 0
        for n in lens:
            out.append(mins[:, j].tolist() if n > 0 else None)
            j += 1 if n > 0 else 0
        return pd.Series(out)

    return sig


def with_minhash_signature_arrow(
    df: DataFrame,
    text_col: str,
    out_col: str = "_sig",
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 1,
    hash_impl: str = "crc32",
) -> DataFrame:
    """Append an ``array<bigint>`` minhash signature (Arrow fast path)."""
    sig = _minhash_signature_udf(num_hashes, shingle_n, seed, hash_impl)
    return df.withColumn(out_col, sig(F.col(text_col)))


def _signature_table(df, id_col, text_col, num_hashes, shingle_n, impl):
    """Narrow (_id, _sig) MinHash signature table (Arrow kernel by
    default; Catalyst reference impl for oracle parity checks)."""
    if impl in ("arrow", "md5"):
        sig = with_minhash_signature_arrow(
            _ensure_parallelism(df.select(F.col(id_col).alias("_id"), F.col(text_col))),
            text_col,
            num_hashes=num_hashes,
            shingle_n=shingle_n,
            hash_impl="md5" if impl == "md5" else "crc32",
        ).select("_id", "_sig")
    else:
        sig = df.select(
            F.col(id_col).alias("_id"),
            minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("_sig"),
        )
    return sig.filter(F.col("_sig").isNotNull())


def _band_explode(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(_id, _sig) → (_id, _sig, band, bucket): one row per band, bucket
    = hash of that band's signature slice. Pure Catalyst explode."""
    return sig.select(
        "_id",
        "_sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "_sig", "bb.band", "bb.bucket")


def _jaccard_est(sig_x, sig_y, num_hashes: int):
    """Estimated jaccard = matching signature components / num_hashes."""
    return F.aggregate(
        F.zip_with(sig_x, sig_y, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / F.lit(float(num_hashes))


def minhash_build_index(
    df: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    impl: str = "arrow",
    n_buckets: int = 32,
) -> None:
    """Write the banded MinHash signature index as a bucketed catalog
    table — the write-once / query-many form the
    :func:`minhash_lsh_pairs` docstring points to for warehouse scale
    (the text-tier twin of ``similarity.ivf_build_index``).

    The table holds (doc_id, sig, band, bucket), hash-bucketed on the
    LSH ``bucket`` column: every later probe joins on (band, bucket),
    so the corpus side of that join is pre-shuffled at write time and
    never moves again — incremental batches pay only their own
    signatures. Append-friendly: new survivors insert into the same
    bucketing (see :func:`minhash_incremental_dedup`).

    Hot-bucket protection lives on the PROBE side
    (``max_bucket_size`` on :func:`minhash_query_index` /
    :func:`minhash_incremental_dedup`), not at build time: bucket
    sizes change as appends accrete, so capping is re-evaluated per
    probe over the buckets each batch actually hits.

    Signature parameters + ``n_buckets`` are recorded as table
    properties; probes/appends validate against them (a mismatched
    ``shingle_n``/``num_hashes`` silently estimates garbage jaccard).
    """
    from ..sources.io import (
        clear_layout_pending,
        get_table_meta,
        mark_layout_pending,
        set_table_meta,
        write_table,
    )

    spark = df.sparkSession
    # monotone rebuild counter, the minhash twin of the IVF centroid
    # fingerprint: buffered skew reports (streaming) flush only while
    # the epoch they were measured under is still current — a rebuild
    # landing mid-drain re-derives every bucket key, so reports against
    # the retired corpus must not re-arm cap_truncating on the fresh log
    prev_epoch = 0
    if spark.catalog.tableExists(table):
        prev_epoch = int(get_table_meta(spark, table).get("skew_epoch", 0) or 0)
    banded = _band_explode(
        _signature_table(df, id_col, text_col, num_hashes, shingle_n, impl),
        bands,
        num_hashes // bands,
    ).select(F.col("_id").alias(id_col), F.col("_sig").alias("sig"), "band", "bucket")
    # fail-loud window: a crash between the data swap and the contract
    # commit below would leave new-layout data under the old recorded
    # parameters — probes would silently join disjoint bucket spaces
    mark_layout_pending(
        spark, table, "minhash_build_index", str(bands),
        snapshot={
            "kind": "minhash", "num_hashes": num_hashes, "bands": bands,
            "shingle_n": shingle_n, "n_buckets": n_buckets,
        },
    )
    write_table(banded, table, bucket_by=(n_buckets, ["bucket"]))
    # a rebuild invalidates the per-append skew history (bucket keys
    # re-derive from the fresh corpus) — clear it like the IVF family
    # clears its drift log on every matrix rotation
    spark.sql(f"DROP TABLE IF EXISTS {_skew_log_table(table)}")
    set_table_meta(
        spark,
        table,
        kind="minhash",
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        n_buckets=n_buckets,
        bucket_cols="bucket",
        skew_epoch=prev_epoch + 1,
    )
    clear_layout_pending(spark, table)


def minhash_reband_index(spark, table: str, bands: int) -> None:
    """Re-derive a standing MinHash index's banding from its STORED
    signatures — the bounded retune verb the ``cap_truncating`` health
    flag points to. Banding is a pure function of (signature, band
    count), so the index alone suffices: one scan of the ``band = 0``
    slice (one row per document, full signature riding on it), one
    re-explode at the new band count, one bucketed rewrite through the
    stage-and-swap. The corpus text is never touched — at 100 TB the
    signatures are orders of magnitude smaller than the documents, so
    retuning costs an index rewrite, not a corpus re-shingle.

    ``reband(b_old → b_new)`` is exactly ``build(b_new)`` over the same
    corpus (hash-verified by the ``m_minhash_reband_dedup`` oracle
    entry): more bands = smaller slices = higher candidate recall at
    the threshold S-curve's low end but hotter buckets (more probe
    work, more cap pressure); fewer bands the reverse. The choice is a
    recall/cost POLICY call, which is why the maintenance sweep only
    surfaces the flag and points here instead of auto-applying (the
    pairs already star-capped are gone either way — retuning changes
    future probes only).

    ``bands`` must divide the recorded ``num_hashes``. Probes validate
    their band count against table meta (``check_table_meta``), so a
    caller still probing with the old band count fails loudly instead
    of silently joining on stale buckets. Rotation bumps
    ``skew_epoch`` and clears the skew log like a rebuild — buffered
    streaming skew reports measured under the old banding are dropped
    at flush, never re-arming ``cap_truncating`` with stale keys.

    Crash-safe via the ``{table}_retune_pending`` marker
    (``io.mark_layout_pending``): a crash between the data swap and
    the contract commit leaves the marker in place, every probe
    refuses (instead of silently joining disjoint bucket spaces), and
    re-running the verb converges from ANY window — the band-0 slice
    it re-derives from carries the full signature under both the old
    and the new banding. ``run_maintenance(apply=True)`` resumes the
    recorded target automatically.
    """
    from ..sources.io import (
        clear_layout_pending,
        get_table_meta,
        mark_layout_pending,
        set_table_meta,
        write_table,
    )

    from ..sources.io import get_layout_pending

    meta = get_table_meta(spark, table)
    if not meta:
        # a previous rewrite crashed after its swap destroyed the
        # table's properties: restore the invariant contract from the
        # marker's snapshot (the re-run re-derives the DATA from the
        # band-0 slice either way)
        pending = get_layout_pending(spark, table)
        if pending is not None:
            meta = pending["snapshot"]
    if meta.get("kind") != "minhash":
        raise ValueError(
            f"{table} is not a minhash index (kind={meta.get('kind')!r})"
        )
    num_hashes = int(meta["num_hashes"])
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}"
        )
    n_buckets = int(meta["n_buckets"])
    idx = spark.table(table)
    id_col = next(
        c for c in idx.columns if c not in ("sig", "band", "bucket")
    )
    docs = idx.filter(F.col("band") == 0).select(
        F.col(id_col).alias("_id"), F.col("sig").alias("_sig")
    )
    banded = _band_explode(docs, bands, num_hashes // bands).select(
        F.col("_id").alias(id_col),
        F.col("_sig").alias("sig"),
        "band",
        "bucket",
    )
    mark_layout_pending(
        spark, table, "minhash_reband_index", str(bands), snapshot=meta
    )
    write_table(banded, table, bucket_by=(n_buckets, ["bucket"]))
    spark.sql(f"DROP TABLE IF EXISTS {_skew_log_table(table)}")
    set_table_meta(
        spark,
        table,
        kind="minhash",
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=int(meta["shingle_n"]),
        n_buckets=n_buckets,
        bucket_cols="bucket",
        skew_epoch=int(meta.get("skew_epoch", 0) or 0) + 1,
    )
    clear_layout_pending(spark, table)


def _skew_log_table(table: str) -> str:
    return f"{table}_skew_log"


def minhash_batch_skew_report(
    idx: DataFrame, banded: DataFrame, max_bucket_size: int | None
) -> dict:
    """Bucket-skew measurement for ONE probe batch against a standing
    MinHash index — the text-tier twin of ``ivf_append_index``'s drift
    report. Sized over only the (band, bucket) keys THIS batch hits
    (the same semi-join bound as :func:`_split_index_hot_buckets`), so
    the cost is O(batch), never O(index): ``sum_sq_bucket_rows`` is the
    Σbucket² probe-work proxy that hot-bucket growth inflates, and
    ``n_capped_buckets`` counts hit buckets over the probe cap — i.e.
    buckets where star semantics are CURRENTLY trading away per-member
    pair recall, the thing the cap truncates silently.

    ``n_capped_batch_buckets`` measures the cap's OTHER truncation site
    (round 17 review): the within-batch star path drops every
    non-representative member of a hot BATCH bucket, and in the
    ``append=False`` steady state those survivors never reach the
    index, so the index-side count alone would sit at zero while the
    cap actively trades recall every batch. Both sides are sized in
    ONE fused agg job (the report is buffered per micro-batch by the
    streaming wrapper, so its job count is part of the per-batch
    floor); the caller decides whether to persist
    (:func:`minhash_append_skew_reports`) or buffer (streaming)."""
    hit = banded.select("band", "bucket").distinct()
    idx_sizes = (
        idx.join(hit, ["band", "bucket"])
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("_side", F.lit("index"))
    )
    batch_sizes = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("_side", F.lit("batch"))
    )
    cap = max_bucket_size
    capv = F.lit(cap if cap is not None else 2**62)
    is_idx = F.col("_side") == "index"
    row = idx_sizes.unionByName(batch_sizes).agg(
        F.coalesce(
            F.sum(F.when(is_idx, 1).otherwise(0)), F.lit(0)
        ).alias("n_hit_buckets"),
        F.coalesce(F.max(F.when(is_idx, F.col("n"))), F.lit(0)).alias(
            "max_bucket_rows"
        ),
        F.coalesce(
            F.sum(F.when(is_idx, F.col("n") * F.col("n"))), F.lit(0)
        ).alias("sum_sq_bucket_rows"),
        F.coalesce(
            F.sum(F.when(is_idx & (F.col("n") > capv), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_capped_buckets"),
        F.coalesce(
            F.sum(F.when(~is_idx & (F.col("n") > capv), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_capped_batch_buckets"),
    ).first()
    return {
        "n_hit_buckets": int(row["n_hit_buckets"]),
        "max_bucket_rows": int(row["max_bucket_rows"]),
        "sum_sq_bucket_rows": int(row["sum_sq_bucket_rows"]),
        "n_capped_buckets": int(row["n_capped_buckets"]),
        "n_capped_batch_buckets": int(row["n_capped_batch_buckets"]),
        "cap": cap,
    }


def minhash_append_skew_reports(spark, table: str, reports: list[dict]) -> None:
    """Append probe-batch skew report dict(s) to the
    ``{table}_skew_log`` companion in ONE write job — same batching
    contract as ``similarity.ivf_append_drift_reports`` (streaming
    buffers per-batch reports and flushes post-drain; the log is
    advisory, so a crash losing a buffer only delays the health flag
    until later batches re-measure)."""
    if not reports:
        return
    from ..sources.io import write_table

    log_row = spark.createDataFrame(
        [
            (
                int(r["n_hit_buckets"]),
                int(r["max_bucket_rows"]),
                int(r["sum_sq_bucket_rows"]),
                int(r["n_capped_buckets"]),
                int(r.get("n_capped_batch_buckets", 0)),
                None if r["cap"] is None else int(r["cap"]),
            )
            for r in reports
        ],
        "n_hit_buckets bigint, max_bucket_rows bigint, "
        "sum_sq_bucket_rows bigint, n_capped_buckets bigint, "
        "n_capped_batch_buckets bigint, cap bigint",
    ).withColumn("logged_at", F.current_timestamp())
    write_table(log_row, _skew_log_table(table), mode="append")


def _split_index_hot_buckets(
    idx: DataFrame,
    probe_banded: DataFrame,
    id_col: str,
    max_bucket_size: int | None,
):
    """Split an index into (cold_rows, hot_representatives) by per-
    (band, bucket) size, counting ONLY buckets the probe batch actually
    hits — a semi-join on the batch's distinct buckets keeps the sizing
    pass proportional to the batch, not the accreted index. Hot buckets
    (size > cap) collapse to their min-``id_col`` representative row, so
    the probe join does O(1) work per hot bucket instead of O(B).
    Returns (idx, None) when ``max_bucket_size`` is None."""
    if max_bucket_size is None:
        return idx, None
    hit = probe_banded.select("band", "bucket").distinct()
    idx_hit = idx.join(hit, ["band", "bucket"])
    w_bucket = Window.partitionBy("band", "bucket")
    sized = idx_hit.withColumn("_bsz", F.count("*").over(w_bucket))
    cold = sized.filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    hot = (
        sized.filter(F.col("_bsz") > max_bucket_size)
        .withColumn(
            "_rn",
            F.row_number().over(w_bucket.orderBy(F.col(id_col).asc())),
        )
        .filter(F.col("_rn") == 1)
        .drop("_bsz", "_rn")
    )
    return cold, hot


def minhash_query_index(
    spark,
    table: str,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.8,
    impl: str = "arrow",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(new_id, corpus_id, jaccard_est) for every new document whose
    estimated jaccard against an indexed corpus document clears the
    threshold. Signature parameters must match the index build. Only
    the new batch is signed and exploded; the corpus index streams out
    of its bucketed table into the (band, bucket) join.

    ``max_bucket_size``: hot-bucket skew guard, the index-probe twin of
    :func:`minhash_lsh_pairs`'s cap. An index bucket that accretes B
    boilerplate documents across appends costs every probe O(B) per
    batch row landing in it; buckets over the cap instead match probes
    against the bucket's min-id REPRESENTATIVE only, threshold-exempt
    (star semantics — the probe doc is merged into the boilerplate
    cluster; per-member pair recall inside the hot bucket is traded
    away). Sizing is computed per probe over only the buckets the batch
    hits, so it stays proportional to the batch."""
    from ..sources.io import check_table_meta

    check_table_meta(
        spark, table, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    )
    idx = spark.table(table)
    nb = _band_explode(
        _signature_table(new_df, id_col, text_col, num_hashes, shingle_n, impl),
        bands,
        num_hashes // bands,
    )
    idx_cold, idx_hot = _split_index_hot_buckets(idx, nb, id_col, max_bucket_size)
    cold = (
        nb.alias("n")
        .join(
            idx_cold.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col("n._id").alias("new_id"),
            F.col(f"c.{id_col}").alias("corpus_id"),
            F.round(
                _jaccard_est(F.col("n._sig"), F.col("c.sig"), num_hashes), 6
            ).alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= threshold)
    )
    if idx_hot is not None:
        # Star pairs vs the hot bucket's min-id representative are
        # threshold-EXEMPT, matching minhash_lsh_pairs: they merge the
        # probe document into the boilerplate cluster the bucket
        # represents (see the max_bucket_size docstring there).
        hot = (
            nb.alias("n")
            .join(
                idx_hot.alias("c"),
                (F.col("n.band") == F.col("c.band"))
                & (F.col("n.bucket") == F.col("c.bucket")),
            )
            .select(
                F.col("n._id").alias("new_id"),
                F.col(f"c.{id_col}").alias("corpus_id"),
                F.round(
                    _jaccard_est(F.col("n._sig"), F.col("c.sig"), num_hashes), 6
                ).alias("jaccard_est"),
            )
        )
        cold = cold.unionByName(hot)
    return cold.dropDuplicates(["new_id", "corpus_id"])


def minhash_incremental_dedup(
    spark,
    table: str,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    append: bool = True,
    n_buckets: int | None = None,
    max_bucket_size: int | None = None,
    storage: str = "checkpoint",
    log_skew: bool | None = None,
    skew_sink: list | None = None,
    **sig_kwargs,
) -> DataFrame:
    """Incremental corpus curation: drop new documents that are
    near-dups of the ALREADY-INDEXED corpus or of an earlier document
    in the same batch, then (``append=True``) add the survivors'
    signatures to the index — so the next batch dedups against
    everything that came before. The streaming-corpus form of
    :func:`minhash_lsh_dedup`: each batch costs its own signatures plus
    one bucketed join against the index, never a corpus re-scan.

    ``n_buckets`` defaults from the index's recorded table properties
    (and is validated against them when passed explicitly) — appends
    with a different bucket count would either fail or silently break
    the pre-shuffled join layout. Signature parameters are validated
    the same way (:func:`~..sources.io.check_table_meta`).

    The batch is SIGNED ONCE: the checkpointed (_id, _sig) table feeds
    the corpus probe, the within-batch self-join, and the survivor
    append alike (the signature kernel is the dominant per-batch cost;
    re-running it per consumer would triple it).

    ``max_bucket_size`` caps hot (band, bucket) keys in BOTH joins —
    the steady-state path a standing pipeline runs per arriving batch,
    where an uncapped boilerplate bucket goes O(B²) within the batch
    and O(B·batch_hits) against an index that accretes the bucket
    across appends. Within the batch, hot buckets emit star losers
    (every non-min-id member is dropped as a dup of the bucket
    representative, threshold-exempt — exactly what
    ``minhash_lsh_dedup`` with a cap does); against the index, probes
    landing in a hot bucket are dropped as members of that boilerplate
    cluster via its representative (see
    :func:`minhash_query_index`). Index bucket sizing is restricted to
    buckets the batch hits, so the guard costs O(batch), not O(index).

    ``storage``: materialization strategy for the signature table and
    the survivor set — ``"checkpoint"`` (default; scoped blocks, fails
    on executor loss), ``"persist"`` (lineage kept, survives executor
    loss — use on preemptible clusters), or ``"table"`` (written stage
    table, survives full job restarts). See :func:`_materialize`.

    ``log_skew`` (round 17): per-batch bucket-skew measurement into the
    ``{table}_skew_log`` companion (:func:`minhash_batch_skew_report` —
    Σbucket² probe-work proxy + the count of INDEX buckets over the cap
    + the count of hot BATCH buckets the within-batch star path capped,
    i.e. both places star semantics trade away per-member recall RIGHT
    NOW). Defaults to ON exactly when ``max_bucket_size`` is set — the
    signal matters when a cap is silently truncating, and an uncapped
    probe stays byte-identical to the pre-r17 plan. ``skew_sink``
    redirects the report into a caller-held buffer instead of a 1-row
    write job (the streaming wrapper flushes ONE write post-drain, the
    same batching contract as the IVF drift log).
    ``maintenance.table_health`` turns the log into a
    ``cap_truncating`` health flag."""
    num_hashes = sig_kwargs.get("num_hashes", 64)
    bands = sig_kwargs.get("bands", 16)
    shingle_n = sig_kwargs.get("shingle_n", 5)
    impl = sig_kwargs.get("impl", "arrow")

    from ..sources.io import check_table_meta

    meta = check_table_meta(
        spark,
        table,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        n_buckets=n_buckets,
    )
    if n_buckets is None:
        n_buckets = int(meta.get("n_buckets", 32))

    sig = _materialize(
        _signature_table(new_df, id_col, text_col, num_hashes, shingle_n, impl),
        storage,
    )
    banded = _band_explode(sig, bands, num_hashes // bands)

    idx = spark.table(table)
    idx_cold, idx_hot = _split_index_hot_buckets(idx, banded, id_col, max_bucket_size)
    vs_corpus = (
        banded.alias("n")
        .join(
            idx_cold.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bucket") == F.col("c.bucket")),
        )
        .filter(
            # round-to-6 before the threshold, matching minhash_query_index /
            # minhash_lsh_pairs (differs only for non-power-of-2 num_hashes,
            # where k/num_hashes is inexact in binary)
            F.round(_jaccard_est(F.col("n._sig"), F.col("c.sig"), num_hashes), 6)
            >= threshold
        )
        .select(F.col("n._id").alias(id_col))
    )
    if idx_hot is not None:
        # Probes landing in a hot index bucket are members of its
        # boilerplate cluster: drop them, threshold-exempt (star
        # semantics, see the docstring).
        vs_hot = (
            banded.alias("n")
            .join(
                idx_hot.alias("c"),
                (F.col("n.band") == F.col("c.band"))
                & (F.col("n.bucket") == F.col("c.bucket")),
            )
            .select(F.col("n._id").alias(id_col))
        )
        vs_corpus = vs_corpus.unionByName(vs_hot)

    within_banded = banded
    within_star = None
    if max_bucket_size is not None:
        # Within-batch star capping, mirroring minhash_lsh_pairs: hot
        # batch buckets drop every non-representative member (greedy
        # dedup keeps the min id either way), bounding the self-join's
        # per-bucket work to O(B) instead of O(B²).
        w_bucket = Window.partitionBy("band", "bucket")
        sized = banded.withColumn("_bsz", F.count("*").over(w_bucket))
        within_star = (
            sized.filter(F.col("_bsz") > max_bucket_size)
            .withColumn(
                "_rep_id", F.first("_id").over(w_bucket.orderBy(F.col("_id").asc()))
            )
            .filter(F.col("_id") != F.col("_rep_id"))
            .select(F.col("_id").alias(id_col))
        )
        within_banded = sized.filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")
    within = (
        within_banded.alias("a")
        .join(
            within_banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(
            F.round(_jaccard_est(F.col("a._sig"), F.col("b._sig"), num_hashes), 6)
            >= threshold
        )
        .select(F.col("b._id").alias(id_col))
    )
    if within_star is not None:
        within = within.unionByName(within_star)
    losers = vs_corpus.unionByName(within).distinct()
    survivors = _materialize(new_df.join(losers, id_col, "left_anti"), storage)

    if log_skew is None:
        log_skew = max_bucket_size is not None
    if log_skew:
        report = minhash_batch_skew_report(idx, banded, max_bucket_size)
        if skew_sink is not None:
            skew_sink.append(report)
        else:
            minhash_append_skew_reports(spark, table, [report])

    if append:
        from ..sources.io import write_table

        surv_banded = banded.join(
            survivors.select(F.col(id_col).alias("_id")), "_id"
        ).select(
            F.col("_id").alias(id_col), F.col("_sig").alias("sig"), "band", "bucket"
        )
        write_table(
            surv_banded, table, mode="append", bucket_by=(n_buckets, ["bucket"])
        )
    return survivors


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's ``sizeInBytes`` estimate for the optimized plan — free
    (no job). None when the estimate is unavailable OR is the
    "unknown" sentinel region (Catalyst assigns ``Long.MaxValue``-ish
    defaults to plans it cannot size, e.g. through Python maps): an
    unknown size must never trigger a size-gated code path."""
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # noqa: BLE001 — best-effort; caller treats as unknown
        return None
    return est if 0 <= est < (1 << 60) else None


def _pair_grain_decision(
    df: DataFrame,
    pair_grain: str,
    narrow_min_input_bytes: int,
) -> str:
    """Resolve ``pair_grain="auto"`` to "wide" or "narrow" from the
    input's free Catalyst size estimate (see :func:`minhash_lsh_pairs`
    for the regime argument). Unknown estimate → "wide" (the current,
    bench-validated shape)."""
    if pair_grain in ("wide", "narrow"):
        return pair_grain
    if pair_grain != "auto":
        raise ValueError(f"pair_grain must be auto|wide|narrow, got {pair_grain!r}")
    est = _plan_size_bytes(df)
    return "narrow" if est is not None and est >= narrow_min_input_bytes else "wide"


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    impl: str = "arrow",
    persist_index: bool = True,
    max_bucket_size: int | None = None,
    storage: str = "checkpoint",
    pair_grain: str = "auto",
    narrow_min_input_bytes: int = 256 << 20,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    Signature is split into ``bands`` bands of ``num_hashes//bands`` rows;
    docs sharing any band bucket become candidates (join on
    (band, bucket-hash) — work is proportional to bucket sizes, not n²).
    Returns (id_a, id_b, jaccard_est) with id_a < id_b and
    signature-estimated Jaccard ≥ threshold.

    ``impl``: "arrow" (default — JVM shingle hashing + vectorized numpy
    min-mix, ~60× faster) or "catalyst" (pure built-in expressions).

    ``persist_index``: materialize the (_id, _sig) signature table so
    the self-join computes signatures once, not once per side (at
    warehouse scale you would write this index to a table instead).
    ``storage`` picks the materialization strategy (see
    :func:`_materialize`): the default ``"checkpoint"`` is scoped —
    blocks are released automatically once the returned DataFrame is
    garbage collected — but NOT recomputable, so an executor loss
    (spot nodes, dynamic-allocation downscale) fails the job.
    ``"persist"`` keeps lineage, surviving executor loss at the price
    of a cache entry that lives until the result is dropped — the
    right knob for preemptible clusters. For long-running deployments,
    write the signature index to a real table instead
    (:func:`minhash_build_index`, the stated warehouse-scale form).

    ``max_bucket_size``: skew guard for boilerplate-heavy corpora. A
    band bucket holding B docs yields B(B-1)/2 candidates under the
    self-join — one viral boilerplate document at web scale (B ~ 10⁶)
    is a 5·10¹¹-pair straggler no matter how AQE splits it. Buckets
    larger than the cap instead emit STAR pairs — every member against
    the bucket's min-id representative, O(B) — which preserves the
    connected component (dedup keeps exactly one representative either
    way) while bounding per-bucket work linearly. Star pairs BYPASS the
    threshold filter (their ``jaccard_est`` may sit below ``threshold``):
    they are connectivity edges, and a capped-bucket member whose
    estimate against the hub fell under the threshold would otherwise
    lose all its edges and survive dedup as a false unique. The price is
    the mirror error — a member that is NOT a true near-dup of the hub
    still gets merged into its component. ``None`` (default) keeps pure
    all-pairs semantics for oracle-exact pair listings; pair RECALL
    between non-representative members of a capped bucket is
    intentionally traded away (they reach each other through the hub),
    so set it only when downstream consumes components/dedup decisions
    rather than the raw pair list.

    ``pair_grain`` (round 18 — the size-adaptive switch deferred from
    round 17): shape of the banded self-join, results identical.

    * ``"wide"`` — the candidate join carries the full signature
      (``bands × num_hashes × 8`` ≈ 8 KiB/doc at defaults through the
      band exchange) and each candidate's estimate is computed before
      the pair-dedup. Fewest stages; the measured optimum at bench SF,
      where per-stage fixed cost (~0.2–0.5 s locally) dominates.
    * ``"narrow"`` — the 100 TB shape: the self-join and pair-dedup run
      over ``(band, bucket, _id)`` only (~24 B/doc/band), and the two
      signatures are re-attached at UNIQUE-pair grain from the
      materialized index to compute the estimate once per pair. ~21×
      fewer bytes per doc through the band exchange at defaults, paid
      for with two extra joins + one extra narrow dedup shuffle —
      measured LOSS at sf0.1 (4.4 → 6.1 s, r17) and win once the
      banded signature bytes dominate the fixed stage cost.
    * ``"auto"`` (default) — "narrow" when Catalyst's free input-size
      estimate is at least ``narrow_min_input_bytes`` (default
      256 MiB), else "wide". Derivation: banded signature shuffle bytes
      = rows × bands × num_hashes × 8 ≈ input_bytes × (8 KiB /
      avg_doc_bytes) at defaults, so a ≥256 MiB corpus (avg docs well
      under 8 KiB — dedup-grade corpora by construction) shuffles
      ≥ hundreds of MiB of signatures that the narrow shape avoids,
      amortizing its ~2 s of extra fixed stage cost many times over;
      an unknown estimate (e.g. a non-scan input behind a Python map)
      falls back to "wide". See ``tools/smoke_minhash_narrow.py`` for
      the measured crossover.
    """
    rows_per_band = num_hashes // bands
    grain = _pair_grain_decision(df, pair_grain, narrow_min_input_bytes)
    sig = _signature_table(df, id_col, text_col, num_hashes, shingle_n, impl)
    if persist_index:
        # Materialize the narrow (_id, _sig) table — NOT the 16×-exploded
        # banded table — eagerly so the self-join's two scans don't each
        # run the signature UDF. The banding explode is cheap Catalyst
        # and recomputes from the checkpointed blocks. localCheckpoint
        # (MEMORY_AND_DISK — spills rather than OOMs) is scoped: unlike
        # persist(), whose SQL-cache entry survives until an explicit
        # unpersist/clearCache, its blocks are freed by the context
        # cleaner when this DataFrame is GC'd, so bench loops and
        # long-lived pipelines don't accumulate executor storage.
        sig = _materialize(sig, storage)

    banded = _band_explode(sig, bands, rows_per_band)

    def _est(sig_x, sig_y):
        return _jaccard_est(sig_x, sig_y, num_hashes)

    if grain == "narrow":
        # The candidate self-join and pair-dedup over (band, bucket,
        # _id) only — Catalyst prunes ``_sig`` out of the band exchange
        # (the bucket hash is computed before the shuffle). Signatures
        # re-attach at UNIQUE-pair grain from the materialized index,
        # so the estimate is computed once per pair instead of once per
        # shared band. Identical output to the wide shape: the estimate
        # is deterministic per (id_a, id_b), so dedup-then-threshold ==
        # threshold-then-dedup.
        slim = banded.select("band", "bucket", "_id")
        hot_cand = None
        if max_bucket_size is not None:
            w_bucket = Window.partitionBy("band", "bucket")
            w_rep = w_bucket.orderBy(F.col("_id").asc())
            sized = slim.withColumn("_bsz", F.count("*").over(w_bucket))
            hot_cand = (
                sized.filter(F.col("_bsz") > max_bucket_size)
                .withColumn("_rep_id", F.first("_id").over(w_rep))
                .filter(F.col("_id") != F.col("_rep_id"))
                .select(
                    F.col("_rep_id").alias("id_a"), F.col("_id").alias("id_b")
                )
            )
            slim = sized.filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")
        a = slim.alias("a")
        b = slim.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sig_a = sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_sig_a"))
        sig_b = sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sig_b"))

        def _attach(p):
            return (
                p.join(sig_a, "id_a")
                .join(sig_b, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    F.round(_est(F.col("_sig_a"), F.col("_sig_b")), 6).alias(
                        "jaccard_est"
                    ),
                )
            )

        pairs = _attach(cand).filter(F.col("jaccard_est") >= threshold)
        if hot_cand is not None:
            # Star pairs stay threshold-exempt (connectivity edges —
            # see the max_bucket_size docstring); deduped before the
            # attach so a member flooded in several buckets re-attaches
            # its signatures once.
            pairs = pairs.unionByName(
                _attach(hot_cand.dropDuplicates(["id_a", "id_b"]))
            )
        return pairs.dropDuplicates(["id_a", "id_b"])

    hot_pairs = None
    if max_bucket_size is not None:
        # One hash exchange on (band, bucket) — the same key the join
        # shuffles on — computes bucket size and the min-id
        # representative's signature in a single window stage.
        w_bucket = Window.partitionBy("band", "bucket")
        w_rep = w_bucket.orderBy(F.col("_id").asc())
        sized = banded.withColumn("_bsz", F.count("*").over(w_bucket))
        hot_pairs = (
            sized.filter(F.col("_bsz") > max_bucket_size)
            .withColumn("_rep_id", F.first("_id").over(w_rep))
            .withColumn("_rep_sig", F.first("_sig").over(w_rep))
            .filter(F.col("_id") != F.col("_rep_id"))
            .select(
                F.col("_rep_id").alias("id_a"),
                F.col("_id").alias("id_b"),
                F.round(_est(F.col("_rep_sig"), F.col("_sig")), 6).alias(
                    "jaccard_est"
                ),
            )
        )
        banded = sized.filter(F.col("_bsz") <= max_bucket_size).drop("_bsz")

    a = banded.alias("a")
    b = banded.alias("b")
    # The estimate is computed BEFORE the pair-dedup and thresholded
    # immediately, so the dropDuplicates shuffle moves 3 narrow columns
    # per candidate — not two 64-element bigint signatures (~1 KB/row)
    # per banded match.
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(_est(F.col("a._sig"), F.col("b._sig")), 6).alias("jaccard_est"),
    )
    pairs = pairs.filter(F.col("jaccard_est") >= threshold)
    if hot_pairs is not None:
        # Star pairs are exempt from the threshold: they exist to keep
        # every capped-bucket member connected to its representative
        # (see the max_bucket_size docstring above).
        pairs = pairs.unionByName(hot_pairs)
    return pairs.dropDuplicates(["id_a", "id_b"])


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    transitive: bool = False,
    **lsh_kwargs,
) -> DataFrame:
    """Drop near-duplicates found by MinHash-LSH.

    Default (greedy): for every pair above threshold the higher id is
    removed — one anti-join, pairs-sized work, but it under-deletes on
    some topologies: survivors are every id never appearing as id_b, so
    pairs (1,3)+(2,3) keep BOTH 1 and 2, transitive near-dups of each
    other through the dropped 3. ``transitive=True`` instead keeps
    exactly one representative (the min id) per CONNECTED COMPONENT of
    the pair graph — topology-independent curation semantics — via
    :func:`connected_components` (a few edge-list-sized rounds).
    Combine with ``max_bucket_size`` for boilerplate-heavy corpora:
    star pairs preserve exactly the connectivity CC needs.
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, **lsh_kwargs)
    if transitive:
        return cc_dedup(df, id_col, pairs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "label",
    storage: str = "checkpoint",
) -> DataFrame:
    """(id, component) for every vertex in ``edges``, where component =
    the MIN vertex id reachable from it (undirected).

    Pair-greedy dedup (drop every ``id_b``) keeps exactly the ids that
    never appear on the right of a pair — a SUPERSET of the component
    minima, i.e. it under-deletes: with pairs (1,3) and (2,3), both 1
    and 2 survive even though they are transitive near-dups of each
    other through the dropped 3. Component-based dedup keeps exactly
    one representative per transitive cluster, independent of pair
    topology — the semantics corpus curation actually wants.

    ``algorithm="label"`` (default): iterative min-label propagation —
    each round every vertex takes the min of its own and its neighbors'
    labels; one shuffle join + one shuffle agg per round, converging in
    O(component diameter) rounds. Near-dup graphs are unions of
    quasi-cliques (diameter 2–3), so a handful of rounds suffices at any
    corpus size; work per round is edge-list-sized, never n².

    ``algorithm="star"``: alternating large-star/small-star (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC '14) —
    O(log²·n) rounds independent of diameter, for graphs that are NOT
    shallow quasi-cliques (chains of pairwise-linked boilerplate
    variants, social/citation graphs). Same output contract; property-
    tested equal to the label path on random graphs.

    Both paths materialize intermediate state each round and exit early
    at a fixed point. ``storage="checkpoint"`` (default) uses
    ``localCheckpoint``: the plan stays flat across iterations and
    blocks are released on GC, but they are unrecoverable — a lost
    executor (spot/preemptible nodes, dynamic-allocation downscale)
    fails the job. ``storage="persist"`` keeps lineage (lost blocks
    recompute; the job survives preemption) at the price of a plan
    that grows with rounds — bounded by ``max_iter``, and each
    superseded round is unpersisted as soon as the next is
    materialized, so storage stays one-round-sized. Use "persist" on
    preemptible hardware, or reliable ``checkpoint()`` via a
    checkpoint dir for very high round counts.
    Raises RuntimeWarning when ``max_iter`` rounds elapse before
    convergence — the returned labels would otherwise silently split a
    wide component (under-deleting in dedup) with no signal.
    """
    if algorithm == "star":
        return _connected_components_star(edges, src, dst, max_iter, storage)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm: {algorithm!r} (label|star)")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # pre-partition the static join side by its per-round key ONCE, so
    # the propagation join never re-exchanges the edge list
    e = _materialize(e.distinct().repartition("b"), storage)
    # Round 1 fused into the init: against identity labels the neighbor
    # join IS the edge list, so min(self ∪ N(self)) is one agg over e —
    # no vertex-distinct pass, no first-round join.
    labels = _materialize(
        e.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("id"), F.least("a", "_mb").alias("comp")
        ),
        storage,
        eager=False,
    )
    changed = None
    prev_upd = labels
    for _ in range(max_iter - 1):
        nbr = e.join(
            labels.select(F.col("id").alias("_b"), "comp"),
            F.col("b") == F.col("_b"),
        ).select(F.col("a").alias("id"), "comp", F.lit(False).alias("_mine"))
        # ONE job per round: the lazy materialization is saved by the
        # convergence count itself (the count scans every row, saving
        # the blocks as a side effect), instead of an eager job
        # followed by a separate change-count job. The old label rides
        # the SAME aggregation as a self-tagged min (each id carries
        # exactly one self row), so change detection costs no join.
        upd = _materialize(
            labels.select("id", "comp", F.lit(True).alias("_mine"))
            .unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("comp").alias("comp"),
                F.min(F.when(F.col("_mine"), F.col("comp"))).alias("_old"),
            ),
            storage,
            eager=False,
        )
        changed = upd.filter(F.col("comp") != F.col("_old")).count()
        labels = upd.select("id", "comp")
        if storage == "persist" and prev_upd is not None:
            # the new round is materialized; the superseded round's
            # blocks back nothing downstream — release them now
            prev_upd.unpersist()
        prev_upd = upd
        if changed == 0:
            break
    if changed is None:
        # max_iter == 1: the only round is the fused init — converged
        # iff no vertex left its identity label
        changed = labels.filter(F.col("comp") != F.col("id")).count()
    if changed != 0:
        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): components wider than "
            "max_iter are split. Increase max_iter or use "
            "algorithm='star' (O(log n) rounds, diameter-independent).",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("id", F.col("comp").alias("component"))


def _connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int, storage: str = "checkpoint"
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al., SoCC
    '14): round count is O(log² n) — in practice ~log n — regardless of
    component diameter, vs O(diameter) for label propagation. A
    1000-link chain converges in ~10 rounds instead of 1000.

    Each round is two edge-list-sized shuffle stages over (node →
    neighborhood-min) windows — no vertex-state table, the edge list IS
    the state, monotonically bending toward a star forest rooted at each
    component's min id:

    - large-star: for every node u, hook each neighbor v > u onto
      m = min(N(u) ∪ {u}) — long tails fold in half.
    - small-star: orient edges big→small; hook u and each smaller
      neighbor onto the neighborhood min — stars flatten.

    Convergence = the edge set reaches a fixed point (star forest:
    every edge is (child, component-min)); detected with a count +
    order-independent hash-sum signature per round (one agg job), which
    avoids a set-equality anti-join. Output matches
    :func:`connected_components`; vertices appear iff they occur in
    ``edges``.
    """
    norm = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("a"),
        F.least(F.col(src), F.col(dst)).alias("b"),
    )
    # Self-loop-only vertices must still appear in the output labeled
    # as their own component — matching the label-propagation path's
    # contract on degenerate input. They re-enter at the final agg
    # (same shuffle, no extra stage).
    self_loops = (
        norm.filter(F.col("a") == F.col("b"))
        .select(F.col("a").alias("id"), F.col("a").alias("component"))
        .distinct()
    )
    e = _materialize(
        norm.filter(F.col("a") != F.col("b")).distinct(),
        storage,
    )

    def signature(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("a", "b")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = signature(e)
    converged = False
    prev_e = e
    for _ in range(max_iter):
        # large-star: undirected neighborhoods; each neighbor strictly
        # greater than u re-attaches to the neighborhood min. Output
        # edges are strictly big→small (v > u ≥ m), so the small-star
        # stage needs no re-orientation.
        und = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        w = Window.partitionBy("a")
        ls = (
            und.withColumn("_m", F.least(F.min("b").over(w), F.col("a")))
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .distinct()
        )
        # small-star: per node u (all neighbors < u), hook u and every
        # non-min neighbor onto the neighborhood min.
        sized = ls.withColumn("_m", F.min("b").over(Window.partitionBy("a")))
        # lazy: the signature agg is the round's one action and saves
        # the blocks as a side effect
        e = _materialize(
            sized.filter(F.col("b") != F.col("_m"))
            .select(F.col("b").alias("a"), F.col("_m").alias("b"))
            .unionByName(sized.select("a", F.col("_m").alias("b")))
            .distinct(),
            storage,
            eager=False,
        )
        new_sig = signature(e)
        if storage == "persist" and prev_e is not None:
            prev_e.unpersist()
        prev_e = e
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        warnings.warn(
            f"connected_components(algorithm='star') did not reach a "
            f"fixed point in {max_iter} rounds; labels may be incorrect. "
            "Increase max_iter.",
            RuntimeWarning,
            stacklevel=3,
        )
    # Fixed point is a star forest: every edge is (child, root). Roots
    # label themselves; the min-agg guards the (warned) non-converged
    # case where a child still carries several parents.
    return (
        e.select(F.col("a").alias("id"), F.col("b").alias("component"))
        .unionByName(
            e.select(F.col("b").alias("id"), F.col("b").alias("component"))
        )
        .unionByName(self_loops)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    shingle_n: int = 8,
    min_hits: int = 1,
    broadcast_bench: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Benchmark decontamination: drop corpus documents sharing ≥
    ``min_hits`` distinct word ``shingle_n``-grams with an evaluation /
    benchmark set — the standard pretraining hygiene pass (asymmetric,
    unlike dedup: the benchmark set is external and always kept).

    Both sides are normalized before shingling (lowercase; whitespace
    collapse is implicit in tokenization — same canonical form as
    ``functions.text.doc_fingerprint``), so trivial case/format variants
    of a benchmark string don't escape the filter. ``normalize=False``
    restores raw-text matching.

    Inverted-index semi-join: the benchmark's distinct shingle set
    (eval suites are small — broadcast by default) joins the corpus
    shingle explosion; documents with enough hits are anti-joined away.
    Corpus-side work is one explode + one join + one aggregate, all
    shuffle-free on the corpus side when the benchmark side broadcasts;
    set ``broadcast_bench=False`` for giant benchmark unions and let
    AQE pick the strategy. 8-gram default follows common practice
    (long enough that chance collisions are negligible, short enough to
    catch partial inclusions).
    """
    canon = (lambda c: F.lower(c)) if normalize else (lambda c: c)
    bsh = (
        bench.select(
            F.explode(
                _shingles(canon(F.col(bench_text_col or text_col)), shingle_n)
            ).alias("shingle")
        )
        .distinct()
    )
    if broadcast_bench:
        bsh = F.broadcast(bsh)
    csh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_shingles(canon(F.col(text_col)), shingle_n)).alias("shingle"),
    )
    # corpus shingles are distinct per doc, so count(*) == distinct
    # shared shingles per document
    hits = (
        csh.join(bsh, "shingle")
        .groupBy("_id")
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") >= min_hits)
        .select(F.col("_id").alias(id_col))
    )
    return df.join(hits, on=id_col, how="left_anti")


def cc_dedup(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    algorithm: str = "label",
    storage: str = "checkpoint",
) -> DataFrame:
    """Keep one representative (the min id) per connected component of
    ``pairs``; rows never appearing in a pair survive untouched. Use
    with any pair generator (ngram_jaccard_pairs, minhash_lsh_pairs,
    simhash_near_dups, embedding_cosine_pairs) when transitive cluster
    semantics are wanted instead of the greedy per-pair drop.
    ``algorithm`` selects the :func:`connected_components` path
    ("label" for shallow near-dup graphs, "star" for high-diameter);
    ``storage`` its per-round materialization strategy
    (checkpoint|persist|table — see :func:`_materialize`).
    """
    labels = connected_components(
        pairs, src=src, dst=dst, algorithm=algorithm, storage=storage
    )
    losers = labels.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def simhash(
    text: Column, bits: int = 64, shingle_n: int = 2,
    hash_impl: str = "xxhash64",
) -> Column:
    """SimHash sketch: sign-sum of per-shingle hash bits → bigint.

    Single pass over the shingle array: each shingle hash is expanded
    to its fixed-width bit string (``bin`` + ``lpad``), the ±1
    contributions are summed per position with ``zip_with``, and the sign
    vector folds MSB-first back into one bigint (wrap-around multiply is
    the desired two's-complement behavior; the session runs ANSI off).
    All higher-order functions — no Python UDFs, no per-bit passes.

    ``hash_impl``: ``"xxhash64"`` (default, fastest JVM path) or
    ``"md5"`` (first 16 hex chars → 64 bits via ``conv``) — the
    md5 family is recomputable by any ANSI engine, so md5-family
    simhashes are DuckDB-oracle replayable bit for bit (round 14, the
    same pattern as the CMS hash family: the registry entry
    hash-checks the sign-sum/bucket/Hamming machinery on the md5
    family; the default stays the scale path under pytest pins)."""
    sh = _shingles(text, shingle_n)
    if hash_impl == "md5":
        def h64(s: Column) -> Column:
            return F.conv(F.substring(F.md5(s), 1, 16), 16, 2)
    elif hash_impl == "xxhash64":
        def h64(s: Column) -> Column:
            return F.bin(F.xxhash64(s))
    else:
        raise ValueError(f"unknown hash_impl: {hash_impl!r}")
    bit_strings = F.transform(
        sh, lambda s: F.split(F.lpad(h64(s), bits, "0"), "")
    )
    sums = F.aggregate(
        bit_strings,
        F.array_repeat(F.lit(0), bits),
        lambda acc, v: F.zip_with(
            acc, v, lambda a, b: a + F.when(b == "1", 1).otherwise(-1)
        ),
    )
    return F.aggregate(
        sums,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc * F.lit(2).cast("bigint")
        + F.when(w > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bucket_bits: int = 16,
    shingle_n: int = 2,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs whose simhashes agree on the top
    ``bucket_bits`` (bucket join) and are within ``max_hamming`` overall
    (exact filter via bit_count(xor)). ``hash_impl`` as in
    :func:`simhash`."""
    sketched = df.select(
        F.col(id_col).alias("_id"),
        simhash(F.col(text_col), 64, shingle_n, hash_impl).alias("_sh"),
    ).withColumn("_bucket", F.shiftrightunsigned(F.col("_sh"), 64 - bucket_bits))
    a, b = sketched.alias("a"), sketched.alias("b")
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a._id") < F.col("b._id")),
        )
        .withColumn(
            "hamming", F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "hamming"
        )
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    impl: str = "lsh",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 7,
    plane_impl: str = "gaussian",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity
    (id_a < id_b, cos_sim ≥ threshold) — the fifth dedup tier, for
    semantic duplicates that share no n-grams (translations,
    paraphrases, re-encodes).

    ``impl="exact"`` is the all-pairs O(n²) oracle baseline — correct,
    never run at scale. ``impl="lsh"`` buckets vectors by
    random-hyperplane sign signature (``n_tables`` independent tables,
    ``n_planes`` planes each) and compares only within buckets: two
    vectors at angle θ share one table's bucket with prob
    (1−θ/π)^n_planes, so for cos ≥ 0.9 (θ ≤ 26°) and 2×8 planes recall
    ≈ 1−(1−0.28)^2 ≈ 0.48 per table pair... in practice near-dup pairs
    (cos ≥ 0.95) land together in ≥1 of the tables almost always.
    Cost: shuffles on bucket keys, candidate volume ∝ bucket sizes —
    never n². Deterministic for a fixed ``seed``. ``plane_impl`` as in
    :func:`~.similarity.lsh_topk` — "md5" swaps the gaussian
    hyperplanes for ±1 Rademacher planes regenerated from md5 parity
    (table t uses ``sign_matrix(dim, n_planes, seed + t)``), making
    the bucketing DuckDB-oracle replayable (round 14).
    """
    from ..functions.vectors import sign_matrix
    from .similarity import _hyperplanes, lsh_signature

    if plane_impl == "md5":
        planes_for = lambda t: sign_matrix(dim, n_planes, seed + t)  # noqa: E731
    elif plane_impl == "gaussian":
        planes_for = lambda t: _hyperplanes(dim, n_planes, seed + t)  # noqa: E731
    else:
        raise ValueError(f"unknown plane_impl: {plane_impl!r}")

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )

    # Norms are projected per ROW on each join side (O(dim) once), so
    # the per-PAIR cost is only the dot product — cosine_similarity
    # inline would re-derive both norms per pair, 3× the work.
    if impl == "exact":
        a = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("_va"),
            l2_norm(F.col(vec_col)).alias("_na"),
        )
        b = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("_vb"),
            l2_norm(F.col(vec_col)).alias("_nb"),
        )
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    elif impl == "lsh":
        sigs = df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            l2_norm(F.col(vec_col)).alias("_n"),
            *[
                lsh_signature(F.col(vec_col), planes_for(t))
                .alias(f"_b{t}")
                for t in range(n_tables)
            ],
        )
        cand = None
        for t in range(n_tables):
            a = sigs.select(
                F.col("_id").alias("id_a"),
                F.col("_v").alias("_va"),
                F.col("_n").alias("_na"),
                F.col(f"_b{t}").alias("_bucket"),
            )
            b = sigs.select(
                F.col("_id").alias("id_b"),
                F.col("_v").alias("_vb"),
                F.col("_n").alias("_nb"),
                F.col(f"_b{t}").alias("_bucket"),
            )
            part = a.join(b, ["_bucket"]).filter(F.col("id_a") < F.col("id_b"))
            cand = part if cand is None else cand.unionByName(part)
        cand = cand.drop("_bucket").dropDuplicates(["id_a", "id_b"])
    else:
        raise ValueError(f"unknown impl: {impl}")
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(
                cosine_from_norms("_va", "_vb", "_na", "_nb"), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


def embedding_cosine_dedup(
    df: DataFrame, id_col: str, vec_col: str, **pair_kwargs
) -> DataFrame:
    """Drop semantic near-duplicates: greedy min-id representative over
    :func:`embedding_cosine_pairs` (same anti-join shape as
    :func:`minhash_lsh_dedup` — pairs-sized, not corpus-sized)."""
    pairs = embedding_cosine_pairs(df, id_col, vec_col, **pair_kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing ≥1
    shingle, via an inverted-index self-join (explode → join on shingle →
    count intersections). ``max_df`` drops shingles present in more than
    that many docs — boilerplate shingles otherwise create quadratic hot
    buckets at scale (the classic skew bomb).

    The (id, shingle) inverted index is consumed FOUR times (document
    frequencies, per-doc sizes, both self-join sides), so it is widened
    past an under-parallel scan (one parquet row group = one task
    otherwise serializes the tokenize+explode) and materialized once
    via scoped localCheckpoint — at warehouse scale you would write it
    to a table, exactly like the minhash signature index (and, as
    there, checkpoint blocks are not recomputable after executor loss —
    prefer the table form on preemptible hardware).
    """
    ex = _ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    # _shingles is array_distinct per doc, so (_id, shingle) rows are
    # already unique: plain count == count_distinct, without the
    # two-phase distinct-aggregate expansion (one shuffle each, with
    # map-side partial aggregation).
    return set_jaccard_pairs(ex, threshold=threshold, max_df=max_df)


def set_jaccard_pairs(
    ex: DataFrame,
    threshold: float = 0.5,
    max_df: int | None = 1000,
    storage: str = "checkpoint",
) -> DataFrame:
    """Exact Jaccard over arbitrary element sets: ``ex`` is an
    ``(_id, shingle)`` frame with one UNIQUE row per (set, element) —
    word shingles, sampled-frame hashes, feature codes, any set-valued
    signature. The inverted-index core shared by
    :func:`ngram_jaccard_pairs` (text) and
    ``multimodal.frame_hash_pairs`` (video): candidate pairs share ≥1
    element (equi-join on the element — never all-pairs), ``max_df``
    caps boilerplate elements (the quadratic skew bomb), and the
    materialized index (``storage`` knob) feeds document frequencies,
    set sizes, and both self-join sides from one computation."""
    if max_df is not None:
        rare = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df_count"))
            .filter(F.col("df_count") <= max_df)
            .select("shingle")
        )
        ex = ex.join(rare, "shingle")
    ex = _materialize(ex, storage)
    sizes = ex.groupBy("_id").agg(F.count("*").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
    storage: str = "checkpoint",
) -> DataFrame:
    """Exact n-gram CONTAINMENT for candidate pairs sharing ≥1 shingle:
    ``containment(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|``
    — the ASYMMETRIC near-dup signal Jaccard misses. A short document
    quoted wholesale inside a long one has high containment but low
    Jaccard (the union is dominated by the long side), so quote/subset
    curation filters on containment, symmetric-dup removal on Jaccard
    (Lee et al. 2022 use both). Emits ``(id_a, id_b, inter,
    containment_a, containment_b)`` with id_a < id_b for every pair
    where EITHER direction clears ``threshold``.

    Same plan skeleton and skew posture as :func:`ngram_jaccard_pairs`
    (inverted-index self-join, ``max_df`` boilerplate-shingle cap,
    materialized index reused across all consumers — ``storage`` knob
    as elsewhere); only the final arithmetic differs.
    """
    ex = _ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    if max_df is not None:
        rare = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df_count"))
            .filter(F.col("df_count") <= max_df)
            .select("shingle")
        )
        ex = ex.join(rare, "shingle")
    ex = _materialize(ex, storage)
    sizes = ex.groupBy("_id").agg(F.count("*").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            F.round(F.col("inter") / F.col("sz_a"), 6).alias("containment_a"),
            F.round(F.col("inter") / F.col("sz_b"), 6).alias("containment_b"),
        )
        .filter(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
    )


def semantic_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_clusters: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
    fit_target_rows: int = 100_000,
    max_cluster_size: int = 100_000,
    impl: str = "mllib",
) -> DataFrame:
    """SemDeDup-style candidate pairs: k-means-cluster the embedding
    space, then compare ONLY within clusters (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public paper; no code reused).

    Complements :func:`embedding_cosine_pairs`'s hyperplane-LSH tier:
    LSH buckets are similarity-randomized (recall decays smoothly with
    angle), k-means cells follow the DATA's density, which is what makes
    SemDeDup effective on web corpora where duplicates concentrate in
    dense regions. Cost model: balanced cells of c ≈ n/k rows cost
    Σc² ≈ n²/k comparisons — pick ``n_clusters`` so n/k stays in the
    tens of thousands (the paper also uses k large, not cores-sized; a
    cell exceeding ``max_cluster_size`` raises with that guidance
    rather than silently going quadratic).

    Plan shape: bounded-sample KMeans fit (same ``_bounded_fit`` policy
    as the IVF index), one JVM ``model.transform`` assignment pass, one
    shuffle on the cell id, then a per-cell Arrow kernel that computes
    the full cosine matrix with ONE numpy matmul per cell — no per-pair
    Catalyst fold, no all-pairs join. NULL embeddings never pair (they
    are dropped before clustering; :func:`semantic_dedup` keeps them as
    survivors).

    Within-cluster-only comparison is the documented recall trade: a
    near-dup pair split across two cells is missed (the paper accepts
    this; raise ``n_clusters`` recall via the exact
    :func:`embedding_cosine_pairs` oracle on samples). Deterministic
    for a fixed seed/data.

    ``impl="grid"`` (round 14): cells come from the deterministic
    :func:`~.similarity.grid_kmeans_fit` trainer and the within-cell
    cosines from a Catalyst fold instead of the numpy matmul — every
    step replayable by any ANSI engine (the v_semantic_dedup oracle).
    MLlib + the Arrow matmul kernel stay the scale-path default.

    Returns ``(id_a, id_b, cos_sim, cell)`` with id_a < id_b,
    cos_sim ≥ threshold.
    """
    from .similarity import _bounded_fit

    vec = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col)
    )
    if impl == "grid":
        from ..functions.vectors import cosine_from_norms, l2_norm
        from .similarity import grid_assign_cells, grid_kmeans_fit

        if n_clusters <= 1:
            assigned = vec.select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_vec"),
                F.lit(0).alias("_cell"),
            )
        else:
            cents = grid_kmeans_fit(vec, id_col, vec_col, k=n_clusters)
            assigned = grid_assign_cells(
                vec, id_col, vec_col, cents, keep_cols=[vec_col]
            ).select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).alias("_vec"),
                F.col("cell").alias("_cell"),
            )
        over = (
            assigned.groupBy("_cell")
            .count()
            .filter(F.col("count") > max_cluster_size)
            .limit(1)
            .collect()
        )
        if over:
            raise ValueError(
                f"semantic_pairs: cell {over[0]['_cell']} has "
                f"{over[0]['count']} rows > max_cluster_size="
                f"{max_cluster_size}; increase n_clusters "
                "(cost is quadratic per cell)"
            )
        a = assigned.select(
            F.col("_id").alias("id_a"), F.col("_vec").alias("_va"),
            l2_norm(F.col("_vec")).alias("_na"),
            F.col("_cell").alias("cell"),
        )
        b = assigned.select(
            F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"),
            l2_norm(F.col("_vec")).alias("_nb"),
            F.col("_cell").alias("cell"),
        )
        return (
            a.join(b, ["cell"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(
                    cosine_from_norms(F.col("_va"), F.col("_vb"), "_na", "_nb"),
                    6,
                ).alias("cos_sim"),
                F.col("cell").cast("int").alias("cell"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    if impl != "mllib":
        raise ValueError(f"unknown impl: {impl!r}")

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_clusters <= 1:
        # degenerate single cell (exact all-pairs through the same
        # kernel — MLlib KMeans requires k >= 2)
        assigned = vec.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_vec"),
            F.lit(0).alias("_cell"),
        )
    else:
        c_vec = vec.withColumn("_v", array_to_vector(F.col(vec_col)))
        fit_df = _bounded_fit(c_vec, fit_fraction, seed, fit_target_rows)
        model = KMeans(
            k=n_clusters, seed=seed, featuresCol="_v", predictionCol="_cell"
        ).fit(fit_df)
        assigned = model.transform(c_vec).select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), "_cell"
        )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"id_a {id_type}, id_b {id_type}, cos_sim double, cell int"
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n > max_cluster_size:
            raise ValueError(
                f"semantic_pairs: cell {int(pdf['_cell'].iloc[0])} has "
                f"{n} rows > max_cluster_size={max_cluster_size}; "
                "increase n_clusters (cost is quadratic per cell)"
            )
        if n < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": [], "cell": []}
            )
        # deterministic output: sort by id so i<j == id_a<id_b
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_vec"]])
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors: cos := 0, never pairs
        sims = (V @ V.T) / norms[:, None] / norms[None, :]
        iu, ju = np.triu_indices(n, k=1)
        keep = np.round(sims[iu, ju], 6) >= threshold
        return pd.DataFrame(
            {
                "id_a": pdf["_id"].to_numpy()[iu[keep]],
                "id_b": pdf["_id"].to_numpy()[ju[keep]],
                "cos_sim": np.round(sims[iu, ju][keep], 6),
                "cell": int(pdf["_cell"].iloc[0]),
            }
        )

    return assigned.groupBy("_cell").applyInPandas(cell_pairs, out_schema)


def semantic_dedup(
    df: DataFrame, id_col: str, vec_col: str, **pair_kwargs
) -> DataFrame:
    """Drop semantic near-duplicates found by :func:`semantic_pairs`:
    greedy min-id representative (losers = id_b of any qualifying pair
    — the same pairs-sized anti-join contract as
    :func:`embedding_cosine_dedup` / :func:`minhash_lsh_dedup`, so the
    three tiers are drop-in comparable). Rows with NULL embeddings
    survive by definition (nothing to compare)."""
    pairs = semantic_pairs(df, id_col, vec_col, **pair_kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def decontaminate_semantic(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    bench_vec_col: str | None = None,
    threshold: float = 0.9,
    impl: str = "exact",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    seed: int = 7,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Embedding-space benchmark decontamination: drop corpus documents
    whose embedding is within cosine ``threshold`` of ANY benchmark
    item — the semantic complement of the n-gram :func:`decontaminate`
    (paraphrased or translated eval questions share no shingles but sit
    next to the original in embedding space).

    ``impl="exact"`` is exact AND scalable here, unlike corpus
    self-join dedup: the benchmark side is eval-suite-sized, so the
    broadcast cross join costs |corpus| × |bench| JVM-side dot products
    — one corpus scan, no shuffle on the corpus. For giant benchmark
    unions, ``impl="lsh"`` buckets both sides by hyperplane sign
    signature (``n_tables`` tables) and compares only within buckets
    (approximate: recall < 1 near the threshold), or set
    ``broadcast_bench=False`` to let AQE pick the join.

    NULL corpus embeddings survive (nothing to compare — same contract
    as :func:`semantic_dedup`)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )

    bvec = bench_vec_col or vec_col
    a = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_va"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = bench.filter(F.col(bvec).isNotNull()).select(
        F.col(bvec).alias("_vb"), l2_norm(F.col(bvec)).alias("_nb")
    )
    if impl == "exact":
        if broadcast_bench:
            b = F.broadcast(b)
        cand = a.join(b)
    elif impl == "lsh":
        from .similarity import _hyperplanes, lsh_signature

        cand = None
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed + t)
            at = a.withColumn("_bkt", lsh_signature(F.col("_va"), planes))
            bt = b.withColumn("_bkt", lsh_signature(F.col("_vb"), planes))
            if broadcast_bench:
                bt = F.broadcast(bt)
            part = at.join(bt, "_bkt").drop("_bkt")
            cand = part if cand is None else cand.unionByName(part)
    else:
        raise ValueError(f"unknown impl: {impl}")
    hits = (
        cand.filter(
            F.round(cosine_from_norms("_va", "_vb", "_na", "_nb"), 6)
            >= F.lit(threshold)
        )
        .select(F.col("_id").alias(id_col))
        .distinct()
    )
    return df.join(hits, on=id_col, how="left_anti")


def _span_explode(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """One row per k-token span: ``(_sid, _pos, _h)`` with ``_h`` the
    16-byte md5 of the space-joined span (never the span text — shuffle
    bytes stay constant per token regardless of ``k``)."""
    if k < 2:
        raise ValueError("span length k must be >= 2 tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_spans = F.size(toks) - F.lit(k - 1)
    spans = F.when(
        n_spans >= 1,
        F.transform(
            F.sequence(F.lit(1), n_spans),
            lambda i: F.struct(
                i.cast("bigint").alias("pos"),
                F.unhex(F.md5(F.array_join(F.slice(toks, i, k), " "))).alias("_h"),
            ),
        ),
    )
    # per-row span hashing is heavy (k-token joins + md5 per position):
    # spread an under-parallel scan before exploding (no-op on real
    # multi-row-group tables)
    return (
        _ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("_sid"), F.explode(spans).alias("_s"))
        .select("_sid", F.col("_s.pos").alias("_pos"), F.col("_s._h").alias("_h"))
    )


def _apply_span_mask(
    df: DataFrame,
    hits: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    out_col: str,
    removed_col: str,
) -> DataFrame:
    """Drop every token covered by a hit span (start ``p`` covers
    ``p .. p+k-1``) and rejoin the survivors — the shared back half of
    :func:`span_dedup` / :func:`span_incremental_dedup`. ``hits`` is an
    ``(id_col, pos)`` DataFrame."""
    per_doc = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_hitpos")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hp = F.coalesce(F.col("_hitpos"), F.array().cast("array<bigint>"))
    # per_doc is usually small → BHJ leaves the corpus side's (possibly
    # under-parallel) partitioning untouched; spread it first so the
    # mask pass distributes. Bind _kept ONCE as its own projected
    # attribute — deriving out_col and removed_col from one nested
    # expression would evaluate the O(tokens × hits) mask twice per row.
    return (
        _ensure_parallelism(df)
        .join(per_doc, on=id_col, how="left")
        .withColumn(
            "_kept",
            F.filter(
                toks,
                lambda t, i: ~F.exists(
                    hp, lambda p: (p <= i + 1) & (i + 1 <= p + F.lit(k - 1))
                ),
            ),
        )
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
                F.array_join(F.col("_kept"), " ")
            ),
        )
        .withColumn(
            removed_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("bigint")).otherwise(
                (F.size(toks) - F.size(F.col("_kept"))).cast("bigint")
            ),
        )
        .drop("_hitpos", "_kept")
    )


def duplicated_span_hits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    exploded: DataFrame | None = None,
) -> DataFrame:
    """All NON-FIRST occurrences of duplicated k-token spans, as
    ``(id, pos)`` rows (1-based token position of the span start).

    A span is every window of ``k`` consecutive whitespace tokens. Any
    span whose corpus-wide occurrence count reaches ``min_count`` is
    "duplicated"; its globally-first occurrence (min ``(id, pos)``) is
    exempt — the copy that :func:`span_dedup` keeps — and every other
    occurrence is a hit. Counting includes repeats WITHIN one document,
    so internal boilerplate repetition is caught too.

    Plan shape (the exact-substring-dedup idea of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    re-expressed relationally instead of via suffix arrays):

    1. explode one row per span — narrow, fuses into the scan; rows
       carry ``(id, pos, unhex(md5(span)) BINARY(16))``, never the
       span text, so shuffle bytes are constant per token regardless
       of ``k`` (128-bit fingerprints: collisions are negligible far
       beyond 100 TB — birthday bound ~2^64 spans);
    2. ``groupBy(fingerprint)`` with ``count`` + ``min(struct(id,
       pos))`` — ONE shuffle whose map side partially aggregates, so a
       boilerplate span repeated millions of times arrives at its
       reducer as one partial row per map task, not one row per copy;
    3. join the exploded spans back to the surviving fingerprints —
       hash join on the fingerprint; a hot duplicated span skews only
       this join, which AQE's skew-join splitting handles (unlike a
       window over the fingerprint, which pins every copy of a hot
       span to one task by construction — deliberately avoided).

    ``exploded``: a pre-built ``(_sid, _pos, _h)`` frame (the
    :func:`_span_explode` output, usually MATERIALIZED by the caller) —
    the incremental path builds it once and feeds the historical probe,
    this within-batch pass, and the index append from the same blocks
    instead of paying the per-row k-token join + md5 pass per consumer.
    """
    if exploded is None:
        exploded = _span_explode(df, id_col, text_col, k)
    firsts = (
        exploded.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(F.struct(F.col("_sid"), F.col("_pos"))).alias("_first"),
        )
        .filter(F.col("_cnt") >= min_count)
        .select("_h", "_first")
    )
    return (
        exploded.join(firsts, "_h")
        .filter(
            ~(
                (F.col("_sid") == F.col("_first._sid"))
                & (F.col("_pos") == F.col("_first._pos"))
            )
        )
        .select(F.col("_sid").alias(id_col), F.col("_pos").alias("pos"))
    )


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    out_col: str = "deduped_text",
    removed_col: str = "n_tokens_removed",
) -> DataFrame:
    """Exact substring deduplication: remove every duplicated k-token
    span from the corpus, keeping its globally-first occurrence — the
    span-level tier between document-level :func:`exact_dedup` and
    chunk-level dedup, catching boilerplate shared across otherwise
    distinct documents (Lee et al. 2022's ExactSubstr, relationally).

    A token is dropped iff some non-first duplicated span covers it
    (hit start ``p`` covers tokens ``p .. p+k-1``); surviving tokens
    are rejoined with single spaces. Appends ``out_col`` (NULL text →
    NULL; everything removed → empty string) and ``removed_col``.
    ``id_col`` values must be unique.

    Scale: :func:`duplicated_span_hits`'s two skew-tolerant shuffles,
    then hits collapse per document (rows = hit count, not token
    count) and join back to the corpus on ``id`` — the corpus itself
    is shuffled once, by its unique id, so no key skew. The coverage
    mask is a higher-order ``filter``/``exists`` pass, O(tokens ×
    hits-per-doc) per row JVM-side; hits are sparse for real corpora
    (a fully-boilerplate document degrades to O(n²/k) for that row
    only).
    """
    hits = duplicated_span_hits(df, id_col, text_col, k=k, min_count=min_count)
    return _apply_span_mask(df, hits, id_col, text_col, k, out_col, removed_col)


def span_build_index(
    df: DataFrame,
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    n_buckets: int = 32,
) -> None:
    """Persist the corpus's distinct k-token span fingerprints as a
    bucketed catalog table — the standing-state form of
    :func:`span_dedup` for a pipeline that ingests batches forever
    (the exact-substring twin of :func:`minhash_build_index`).

    The table holds one 16-byte ``_h`` per DISTINCT span ever seen,
    hash-bucketed on ``_h``: each later probe joins on ``_h`` against a
    side that was pre-shuffled at write time. Size is bounded by the
    corpus's distinct-span count (≤ its token count), and existence is
    all the dedup semantics need — historical copies always outrank a
    new batch, so no (id, pos) payload is stored. ``k`` is part of the
    index contract: every probe/append must pass the same value.

    Run :func:`span_dedup` over the initial corpus FIRST if it should
    be self-deduped before becoming the standard; the index then
    memorializes whatever text the caller passed here.

    ``k`` and ``n_buckets`` are recorded as table properties
    (:func:`~..sources.io.set_table_meta`); probes and appends validate
    against them — a silent ``k`` mismatch would never match any gram
    and pass everything through undeduped.
    """
    from ..sources.io import set_table_meta, write_table

    # _src_batch records which STREAMING batch first contributed a
    # fingerprint (NULL for the base corpus): a crash-replayed batch
    # can then probe the index as it stood before that batch ran —
    # without it, replay would mask the batch against its own spans
    fps = (
        _span_explode(df, id_col, text_col, k)
        .select("_h")
        .distinct()
        .withColumn("_src_batch", F.lit(None).cast("bigint"))
    )
    write_table(fps, table, bucket_by=(n_buckets, ["_h"]))
    set_table_meta(
        df.sparkSession, table, kind="span", k=k, n_buckets=n_buckets,
        bucket_cols="_h",
    )


def span_incremental_dedup(
    spark,
    table: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    append: bool = True,
    out_col: str = "deduped_text",
    removed_col: str = "n_tokens_removed",
    storage: str = "checkpoint",
    n_buckets: int | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Exact substring dedup of ONE arriving batch against everything
    ever seen: a batch token is dropped iff covered by a span that is
    (a) already in the ``table`` index — any historical occurrence
    outranks the batch — or (b) a non-first duplicate WITHIN the batch
    (:func:`duplicated_span_hits` semantics). With ``append=True`` the
    batch's distinct previously-unseen fingerprints then join the
    index, so later batches dedup against this one. Returns the masked
    batch (same contract as :func:`span_dedup`).

    ``batch_id`` makes the call CRASH-REPLAY EXACT for a streaming
    caller: appended fingerprints are stamped ``_src_batch =
    batch_id``, and the historical probe EXCLUDES rows stamped with
    the same id — so if a crash happened after the index extension but
    before the sink committed, the redelivered batch probes the index
    exactly as it stood before the first attempt (instead of masking
    itself against its own spans), and the re-append is a no-op
    (anti-join). Indexes built before the ``_src_batch`` column
    existed degrade gracefully: no exclusion, unstamped append.

    The hit set is MATERIALIZED (``storage``: checkpoint|persist|table, see
    :func:`_materialize` for the durability trade-off) before the
    append touches the index — the returned DataFrame is lazy, and an
    un-materialized hit plan re-read at collect time would see the
    index ALREADY containing this batch's own spans and mask every
    token (caught by
    ``test_span_incremental_dedup_against_persisted_index``).

    Steady-state cost is batch-proportional: the batch pays its own
    span explode, one bucket-key semi-join against the pre-shuffled
    index (never an index scan-and-shuffle), its own within-batch
    groupBy, and a distinct+anti-join for the append — the full-corpus
    re-dedup never reruns. Eventually-masked text is what the CALLER
    keeps; the index remembers original spans (by design: a span seen
    once and masked later must still be recognized as seen).

    ``k`` is validated against the index's recorded contract and
    ``n_buckets`` defaults from it (:func:`~..sources.io.check_table_meta`)
    — a mismatched ``k`` would silently dedup nothing, and a mismatched
    append bucket spec would fail (or break the pre-shuffled layout).
    """
    from ..sources.io import check_table_meta

    meta = check_table_meta(spark, table, k=k, n_buckets=n_buckets)
    if n_buckets is None:
        n_buckets = int(meta.get("n_buckets", 32))

    idx = spark.table(table)
    probe_idx = idx
    if batch_id is not None and "_src_batch" in idx.columns:
        # replay view: the index as it stood BEFORE this batch first ran
        probe_idx = idx.filter(
            F.col("_src_batch").isNull() | (F.col("_src_batch") != batch_id)
        )
    # exploded ONCE and materialized: the historical probe, the
    # within-batch groupBy + join-back, and the append all reuse these
    # blocks (the per-row k-token join + md5 pass is the dominant
    # per-batch cost; lazily re-deriving it per consumer would pay it
    # 3-4x).
    sb = _materialize(_span_explode(batch, id_col, text_col, k), storage)
    # (a) historical hits: semi-join keeps the probe side's (id, pos)
    hist_hits = sb.join(probe_idx, "_h", "leftsemi").select(
        F.col("_sid").alias(id_col), F.col("_pos").alias("pos")
    )
    # (b) within-batch non-first duplicates
    batch_hits = duplicated_span_hits(batch, id_col, text_col, k=k, exploded=sb)
    hits = _materialize(
        hist_hits.unionByName(batch_hits).distinct(), storage
    )
    masked = _apply_span_mask(batch, hits, id_col, text_col, k, out_col, removed_col)
    if append:
        from ..sources.io import write_table

        # anti-join against the FULL index (not the replay view): a
        # redelivered batch's fingerprints are already present, so the
        # re-append is a no-op
        new_fps = sb.select("_h").distinct().join(idx, "_h", "leftanti")
        if "_src_batch" in idx.columns:
            new_fps = new_fps.withColumn(
                "_src_batch", F.lit(batch_id).cast("bigint")
            )
        write_table(new_fps, table, mode="append", bucket_by=(n_buckets, ["_h"]))
    return masked
