"""Similarity search over embedding columns (array<float>).

Two paths:
- ``brute_force_topk``: exact cosine top-k of the corpus against a query
  set — the corpus is scanned once, queries are broadcast, per-query
  ranking is a hash-partitioned window. The right baseline, and at 100 TB
  still the right answer when the query set is small (one scan, no index).
- ``lsh_topk``: random-hyperplane (sign) LSH — corpus bucketed by bit
  signature once, queries probe their own bucket (+ optional multi-probe
  neighbors); exact cosine only inside buckets. The scale path for large
  query sets: candidate work ∝ bucket size, not corpus size.

Hyperplanes are generated driver-side from a fixed seed (numpy) and
shipped as literal arrays — deterministic, no UDFs anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vectors import cosine_from_norms, l2_norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cos_sim, rank).

    ``queries`` must be small enough to broadcast (it is pinned with a
    broadcast hint); ranking shuffles once on query_id. Ties break on
    vec_id for determinism.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qn"),
        )
    )
    # norms projected per row on each side BEFORE the cross join: the
    # per-(query, doc) cost is only the dot product
    scored = (
        corpus.withColumn("_cn", l2_norm(F.col(vec_col)))
        .crossJoin(q)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.round(
                cosine_from_norms(F.col(vec_col), F.col("_qvec"), "_cn", "_qn"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(float).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bit signature as bigint: bit i = 1 iff dot(v, plane_i)>0."""
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(0)
    return sig


def _bounded_fit(
    c_vec: DataFrame,
    fit_fraction: float | None,
    seed: int,
    fit_target_rows: int,
) -> DataFrame:
    """The DataFrame the KMeans coarse quantizer fits on.

    Explicit ``fit_fraction`` wins. Default (``None``) is a size-aware
    bound: one narrow ``count()`` of the corpus, then a
    ``min(1.0, fit_target_rows / n)`` sample — so at test scale (n ≤
    target) the fit sees every row and results are unchanged, while at
    100 TB the quantizer fit stays a bounded job instead of becoming
    THE job. KMeans only needs representative centers; 100k rows
    estimate n_clusters ≤ a few hundred centroids to well within the
    cell-assignment noise floor.
    """
    if fit_fraction is not None:
        return (
            c_vec.sample(fit_fraction, seed=seed)
            if fit_fraction < 1.0
            else c_vec
        )
    n = c_vec.count()
    if n <= fit_target_rows:
        return c_vec
    return c_vec.sample(fit_target_rows / n, seed=seed)


GRID_QUANT = 1 << 20  # quantization scale for the replayable KMeans path


def _quantized_vec(vec_col: str, impl: str):
    """The vector expression centroid/drift math runs on: grid
    centroids live in quantized units (coordinate × ``GRID_QUANT``),
    so grid-impl measurements re-quantize the stored floats to match;
    mllib uses the raw vector. ONE definition shared by the drift
    baseline (:func:`_finalize_index_contract`), the per-append drift
    measure (:func:`ivf_append_index`), and stranded-cell adoption
    (:func:`_adopt_stranded_cells`) — a drifted copy in any one of
    them would silently break comparability between build stats and
    append batches."""
    if impl == "grid":
        return F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(GRID_QUANT)), 0),
        )
    return F.col(vec_col)


def grid_kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 2,
    quant: int = GRID_QUANT,
) -> list[list[float]]:
    """Deterministic, cross-engine-replayable Lloyd KMeans — the md5
    family's answer to "KMeans cells are engine internals" (same
    pattern as the minhash/CMS/HLL md5 impls): every step is a pure
    function of the data that any ANSI engine reproduces bit for bit,
    so IVF/SemDeDup cell boundaries become oracle-checkable.

    - **Init**: the ``k`` vectors with the smallest
      ``(md5(cast(id as string)), id)`` — a seeded sample any engine
      can order identically.
    - **Quantized geometry**: coordinates are ``round(x * 2^20)``
      BIGINTs, so per-cell centroid SUMS are exact integers — no float
      aggregation order exists to drift between engines (the HLL
      register trick). Centroids are ``float(s)/float(n)`` doubles:
      one correctly-rounded division of exact integers, identical in
      Python, Spark, and DuckDB (sums stay far below 2^53).
    - **Assignment**: squared-L2 fold over the quantized coords in
      array order (deterministic IEEE sequence), ties broken by cell
      id, as a plain broadcast join + row_number — no UDF.
    - **Fixed ``iters``** Lloyd rounds; an empty cell keeps its
      previous centroid.

    Returns centroids in QUANTIZED units (divide by ``quant`` for raw
    space). MLlib KMeans remains the scale-path default everywhere —
    this trainer exists for oracle parity and costs ``iters`` extra
    n×k assignment passes, fine on the bounded fit samples it runs on.
    """
    spark = df.sparkSession
    vq = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(quant)), 0).cast(
            "long"
        ),
    )
    base = df.select(F.col(id_col).alias("_id"), vq.alias("_vq"))
    init = (
        base.select(
            "_id", "_vq", F.md5(F.col("_id").cast("string")).alias("_h")
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    centroids = [[float(v) for v in r["_vq"]] for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        asg = grid_assign_cells(base, "_id", "_vq", centroids, quantized=True)
        sums = (
            asg.select("cell", F.posexplode("_vq").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["s"], r["n"])
        centroids = [
            [
                float(by_cell[ci][p][0]) / float(by_cell[ci][p][1])
                for p in range(dim)
            ]
            if ci in by_cell
            else centroids[ci]  # empty cell keeps its previous centroid
            for ci in range(k)
        ]
    return centroids


def _grid_centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(ci, [float(v) for v in c]) for ci, c in enumerate(centroids)],
        "cell int, _cvec array<double>",
    )


def grid_assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    quant: int = GRID_QUANT,
    quantized: bool = False,
    n_probe: int = 1,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Assign every row its ``n_probe`` nearest centroids (quantized
    squared-L2, ties by cell id) — the replayable twin of the MLlib
    transform / numpy probe. Broadcast k-row centroid table, one
    row_number window keyed by the row id; no UDF, no Python in the
    scan. ``quantized=True`` means ``vec_col`` already holds the
    round(x·quant) BIGINT coords."""
    spark = df.sparkSession
    vqc = (
        F.col(vec_col)
        if quantized
        else F.transform(
            F.col(vec_col),
            lambda x: F.round(
                x.cast("double") * F.lit(float(quant)), 0
            ).cast("long"),
        )
    )
    extra = [F.col(c) for c in (keep_cols or [])]
    dist = (
        df.select(F.col(id_col), *extra, vqc.alias("_vq"))
        .crossJoin(F.broadcast(_grid_centroids_df(spark, centroids)))
        .select(
            F.col(id_col),
            *extra,
            "_vq",
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("_vq"),
                    F.col("_cvec"),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("_d"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("_d", "cell")
    return (
        dist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
        .drop("_d", "_rn")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    fit_fraction: float | None = None,
    fit_target_rows: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "mllib",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    MLlib KMeans learns ``n_clusters`` centroids on a bounded sample —
    ``fit_fraction`` if given, else a size-aware
    ``min(1.0, fit_target_rows / n)`` default (see :func:`_bounded_fit`;
    the model only needs representative centers, not every row, and an
    unbounded fit over a 100 TB corpus would dominate the query). Each
    corpus vector is assigned to its nearest centroid (one JVM-side
    model.transform pass). A query probes its ``n_probe`` nearest cells
    — centroid distances are computed in one numpy matmul per Arrow
    batch since the centroid matrix is tiny — and exact cosine runs
    only inside probed cells. The classic recall/compute dial:
    n_probe/n_clusters bounds the fraction of the corpus scanned per
    query. At 100 TB, persist the assigned corpus as a bucketed table
    partitioned by cell id so probes prune partitions.

    ``impl="grid"`` (round 14) swaps the trainer for
    :func:`grid_kmeans_fit` and both assignment passes for
    :func:`grid_assign_cells`, making cell boundaries — and therefore
    the whole approximate result — replayable by any ANSI engine (the
    DuckDB oracle recomputes the init, every Lloyd round, both
    assignments, and the in-cell cosine ranking). MLlib stays the
    scale-path default.
    """
    if impl == "grid":
        centroids_q = grid_kmeans_fit(
            corpus, id_col, vec_col, k=n_clusters,
        )
        indexed = grid_assign_cells(
            corpus, id_col, vec_col, centroids_q, keep_cols=[vec_col]
        ).drop("_vq")
        probes = grid_assign_cells(
            queries, query_id_col, vec_col, centroids_q,
            n_probe=n_probe, keep_cols=[vec_col],
        ).select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qn"),
            "cell",
        ).withColumnRenamed("cell", "_cell")
        indexed = indexed.withColumnRenamed("cell", "_cell")
    elif impl == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c_vec = corpus.withColumn("_v", array_to_vector(F.col(vec_col)))
        fit_df = _bounded_fit(c_vec, fit_fraction, seed, fit_target_rows)
        model = KMeans(
            k=n_clusters, seed=seed, featuresCol="_v", predictionCol="_cell"
        ).fit(fit_df)
        indexed = model.transform(c_vec).select(
            F.col(id_col), F.col(vec_col), F.col("_cell")
        )

        centroids = np.stack([np.asarray(ct, dtype=np.float64) for ct in model.clusterCenters()])

        @pandas_udf("array<int>")
        def probe_cells(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
                return pd.Series([], dtype=object)
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            # squared euclidean to every centroid: ||v||² - 2 v·c + ||c||²
            d = (V**2).sum(1)[:, None] - 2 * V @ centroids.T + (centroids**2).sum(1)[None, :]
            nearest = np.argsort(d, axis=1)[:, :n_probe]
            return pd.Series([row.astype("int32").tolist() for row in nearest])

        probes = queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qn"),
            F.explode(probe_cells(F.col(vec_col))).alias("_cell"),
        )
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    cand = (
        indexed.withColumn("_cn", l2_norm(F.col(vec_col)))
        .join(F.broadcast(probes), "_cell")
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.round(
                cosine_from_norms(F.col(vec_col), F.col("_qvec"), "_cn", "_qn"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _centroid_dist(vec_col: str, cell_col: str, centroids: list[list[float]]) -> Column:
    """Euclidean distance from a vector to its assigned centroid, as a
    pure Catalyst expression: the centroid matrix ships as a literal
    array-of-arrays (n_clusters × dim floats — tiny), indexed by the
    cell id, then a zip_with/aggregate squared-diff fold. No Python in
    the pass that scans the vectors."""
    lit_c = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    assigned = F.element_at(lit_c, F.col(cell_col) + 1)
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                assigned,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _drift_stats_table(table: str) -> str:
    return f"{table}_drift_stats"


def _drift_log_table(table: str) -> str:
    return f"{table}_drift_log"


def _centroids_table(table: str) -> str:
    return f"{table}_centroids"


def ivf_load_centroids(spark, table: str) -> list[list[float]]:
    """Recover the centroid matrix :func:`ivf_build_index` persisted
    beside ``table`` (the ``{table}_centroids`` companion), validated
    against the index's recorded fingerprint — the session-independent
    way for probes to obtain the CURRENT matrix, including after a
    maintenance :func:`ivf_retrain_index` rotated it (probes still
    holding the pre-retrain matrix are rejected by every entry point;
    this is how they re-sync). k × dim rows — a driver-side collect by
    design."""
    rows = spark.table(_centroids_table(table)).orderBy("cell").collect()
    centroids = [list(r["centroid"]) for r in rows]
    if [r["cell"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"{_centroids_table(table)} is not a dense 0..k-1 cell map; "
            "rebuild the index"
        )
    # the companion stores doubles; build-time centroids are doubles
    # for BOTH impls (grid Lloyd means are exact-integer-sum divisions,
    # still fractional doubles), and parquet double roundtrip is
    # lossless — so the loaded matrix is bit-identical to the built one
    # and the fingerprint check below proves it
    _check_centroids(spark, table, centroids)
    return centroids


def _centroid_fingerprint(centroids: list[list[float]]) -> str:
    """Stable md5 of the centroid matrix (values rounded to 9 dp) —
    recorded as index metadata at build time and validated on every
    probe/append, because both take ``centroids`` as an ARGUMENT: a
    caller passing the matrix from a different (older, rebuilt) run
    would otherwise bin/probe against cells that don't match the
    on-disk layout, silently destroying recall."""
    import hashlib
    import json

    payload = json.dumps(
        [[round(float(x), 9) for x in c] for c in centroids]
    ).encode()
    return hashlib.md5(payload).hexdigest()


def _check_centroids(spark, table: str, centroids: list[list[float]]) -> None:
    from ..sources.io import check_table_meta

    check_table_meta(
        spark, table, centroid_fp=_centroid_fingerprint(centroids)
    )


def ivf_build_index(
    corpus: DataFrame,
    table: str,
    n_clusters: int = 16,
    seed: int = 42,
    fit_fraction: float | None = None,
    fit_target_rows: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_codebook: "PQCodebook | None" = None,
    impl: str = "mllib",
    n_id_buckets: int = 8,
) -> list[list[float]]:
    """Materialize the IVF index :func:`ivf_topk` computes on the fly:
    fit the KMeans coarse quantizer, assign every corpus vector its
    nearest cell, and write the assigned corpus as a parquet catalog
    table **partitioned by cell id** — each cell is its own directory,
    so a probe that touches ``n_probe`` of ``n_clusters`` cells lists
    and scans only those directories. This is the write-once /
    query-many form for 100 TB corpora: the KMeans fit samples
    (``fit_fraction``, else the size-aware ``fit_target_rows`` bound of
    :func:`_bounded_fit`), the assignment is one JVM model.transform pass,
    and queries (:func:`ivf_query_index`) never rescan or re-cluster.
    Returns the centroid matrix to hand to ``ivf_query_index``, and
    ALSO persists it beside the table as the ``{table}_centroids``
    companion (n_clusters × dim floats — tiny), so probes in other
    sessions — and probes resuming after a maintenance retrain rotated
    the matrix — recover it with :func:`ivf_load_centroids` instead of
    holding driver state.

    Also records the BUILD-TIME quantization-distance distribution
    (mean / p95 distance of each corpus vector to its assigned
    centroid) in a one-row companion table ``{table}_drift_stats``:
    :func:`ivf_append_index` compares every appended batch against it
    and recommends a rebuild when the quantizer has drifted. The stats
    pass scans the just-written index table, not the raw corpus — no
    second ``model.transform``.

    ``impl="grid"`` (round 14) trains with the deterministic
    :func:`grid_kmeans_fit` and assigns with :func:`grid_assign_cells`
    instead of MLlib, making the whole index replayable by any ANSI
    engine (the v_ivf_index_topk oracle). Grid centroids — including
    the RETURNED matrix, the fingerprint, and the drift stats — live
    in QUANTIZED units (coordinate × 2^20); the ``impl`` is recorded
    in the table meta so appends re-quantize their batches to match.

    The layout is cell-partitioned AND id-bucketed
    (``n_id_buckets`` hash buckets on ``id_col``, recorded in the
    table meta so appends match the spec): probes prune by the
    ``_cell`` directories as before, while the streaming-ingest
    replay guard (:func:`~..streaming.events.stream_ivf_append`'s id
    anti-join) streams the id column out of the bucketed layout
    PRE-SHUFFLED — per-batch probe cost tracks the batch, not the
    monotonically growing index, the same flat-probe property the
    exact seen-set measures (``dedup.exact_build_index``).
    """
    from ..sources.io import write_table

    _spark = corpus.sparkSession
    if _spark.catalog.tableExists(table):
        # rebuilding over an existing index: a crashed merge's pending
        # plan fences this too — dropping it here and overwriting would
        # be safe for the DATA, but a crash between the overwrite and
        # the manifest drop would leave the old plan resumable against
        # the brand-new rows (replaying fold/renumber decided for the
        # retired layout). Resume the merge first; it converges from
        # any crash state, then the rebuild proceeds clean.
        _refuse_pending_merge(_spark, table, "a rebuild")
    else:
        # no index table: a manifest here is an orphan of a dropped
        # index (companions outlive a manual DROP TABLE) — retire it
        _drop_merge_manifest(_spark, table)

    if impl == "grid":
        centroids_q = grid_kmeans_fit(corpus, id_col, vec_col, k=n_clusters)
        indexed = (
            grid_assign_cells(
                corpus, id_col, vec_col, centroids_q, keep_cols=[vec_col]
            )
            .drop("_vq")
            .withColumnRenamed("cell", "_cell")
            .select(F.col(id_col), F.col(vec_col), F.col("_cell"))
        )
        centroids = centroids_q
    elif impl == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c_vec = corpus.withColumn("_v", array_to_vector(F.col(vec_col)))
        fit_df = _bounded_fit(c_vec, fit_fraction, seed, fit_target_rows)
        model = KMeans(
            k=n_clusters, seed=seed, featuresCol="_v", predictionCol="_cell"
        ).fit(fit_df)
        indexed = model.transform(c_vec).select(
            F.col(id_col), F.col(vec_col), F.col("_cell")
        )
        centroids = [list(map(float, ct)) for ct in model.clusterCenters()]
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    if pq_codebook is not None:
        # persist ADC codes beside the vectors: ivf_pq_index_topk then
        # reads only (id, _cell, pq_code) — the m-byte column — and
        # never touches the float vectors at query time
        indexed = pq_encode(indexed, pq_codebook, vec_col=vec_col)
    write_table(
        indexed,
        table,
        partition_by=["_cell"],
        bucket_by=(n_id_buckets, [id_col]),
    )

    spark = corpus.sparkSession
    _finalize_index_contract(
        spark,
        table,
        centroids,
        impl=impl,
        pq=pq_codebook is not None,
        n_id_buckets=n_id_buckets,
        id_col=id_col,
        vec_col=vec_col,
    )
    from ..sources.io import set_table_meta

    # the k of the LAST FULL FIT, preserved verbatim by hot-cell splits
    # (which only append cells): maintenance's split budget is a
    # multiple of this, so repeated drift cannot ratchet the budget up
    set_table_meta(spark, table, base_n_clusters=n_clusters)
    if pq_codebook is not None:
        # persist the codebook beside the index so retrains and
        # other-session appends need no caller-held object
        pq_save_codebook(spark, table, pq_codebook)
    return centroids


def _finalize_index_contract(
    spark,
    table: str,
    centroids: list[list[float]],
    impl: str,
    pq: bool,
    n_id_buckets: int,
    id_col: str,
    vec_col: str,
) -> None:
    """Record everything that makes an IVF table self-describing after
    its rows changed quantizer: contract metadata (incl. the rotated
    centroid fingerprint — stale matrices are rejected from here on),
    the persisted ``{table}_centroids`` companion other sessions
    resolve, a FRESH drift baseline (one read-only scan of the index),
    and a cleared per-append drift log (reports against the old
    centroids are meaningless, and this resets maintenance's
    ``retrain_recommended``). Shared by build, retrain, and hot-cell
    split — the three paths that rotate the matrix."""
    from ..sources.io import set_table_meta, write_table

    # pre-bucketing indexes (n_id_buckets=0) record NO bucket spec:
    # writing n_buckets/bucket_cols for files that are not actually
    # bucket-aligned would make ivf_append_index attempt a bucketed
    # append into an unbucketed table and inflate index_table_health's
    # fanout denominator
    bucket_meta = (
        {"n_buckets": n_id_buckets, "bucket_cols": id_col}
        if n_id_buckets
        else {}
    )
    set_table_meta(
        spark,
        table,
        kind="ivf",
        n_clusters=len(centroids),
        dim=len(centroids[0]),
        pq=str(pq).lower(),
        impl=impl,
        centroid_fp=_centroid_fingerprint(centroids),
        partition_cols="_cell",
        **bucket_meta,
    )
    write_table(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        ),
        _centroids_table(table),
    )
    spark.sql(f"DROP TABLE IF EXISTS {_drift_log_table(table)}")
    # grid centroids live in quantized units: measure drift in the
    # same units so build stats and append batches stay comparable
    dist_vec = _quantized_vec(vec_col, impl)
    stats = (
        spark.table(table)
        .withColumn("_qv", dist_vec)
        .withColumn("_dist", _centroid_dist("_qv", "_cell", centroids))
        .drop("_qv")
        .agg(
            F.avg("_dist").alias("mean_dist"),
            F.expr("approx_percentile(_dist, 0.95, 10000)").alias("p95_dist"),
            F.count("*").alias("n_vectors"),
        )
    )
    write_table(stats, _drift_stats_table(table))


def ivf_append_index(
    new_vectors: DataFrame,
    table: str,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    drift_threshold: float = 1.5,
    pq_codebook: "PQCodebook | None" = None,
    log_drift: bool = True,
    build_stats: "tuple | None" = None,
) -> dict:
    """Incrementally extend a persisted :func:`ivf_build_index` table:
    assign each new vector to its nearest EXISTING centroid (one numpy
    matmul against the tiny centroid matrix per Arrow batch — no
    re-clustering, no corpus re-scan) and append into the same
    cell-partitioned layout, so :func:`ivf_query_index` probes see old
    and new vectors alike. The streaming-ingest form of the vector
    index, mirroring ``dedup.minhash_incremental_dedup`` for text.

    Quantizer drift: appended data is binned by the ORIGINAL centroids.
    If the new distribution shifts far from the fit, cells skew and
    probe recall decays. Every append therefore MEASURES drift — the
    batch's mean/p95 distance to its assigned centroids vs the
    build-time distribution :func:`ivf_build_index` recorded — and the
    returned dict carries ``rebuild_recommended=True`` when the batch
    p95 exceeds ``drift_threshold ×`` the build p95 (an
    out-of-distribution batch quantizes visibly worse; an
    in-distribution one tracks the build stats). Rebuild cost is one
    fit on a bounded sample plus one assignment pass
    (:func:`ivf_retrain_index` is that action, runnable straight off
    the standing table). Indexes built before stats existed yield
    ``build_p95=None`` and no recommendation.

    ``log_drift=True`` also APPENDS the report as one row to the
    ``{table}_drift_log`` companion, so the recommendation persists
    past the caller (the streaming ingest's per-batch dict is
    otherwise dropped on the floor) and ``maintenance.table_health``
    can flag ``retrain_recommended`` from a constant-time read of the
    log instead of rescanning any data. :func:`ivf_retrain_index`
    clears the log, resetting the flag. One extra one-row write per
    append; pass ``log_drift=False`` on paths that cannot afford it.

    Input hygiene: external incremental batches are the one path fed by
    arbitrary upstreams, so NULL or wrong-dimension embeddings are
    FILTERED OUT before assignment (a single NULL would otherwise fail
    the whole append inside the UDF) — the returned dict counts them in
    ``n_dropped``. Empty batches write nothing.

    Per-batch job shape (r17 optimization round): the default (mllib)
    path runs ONE checkpointed pass over the batch — invalid rows are
    assigned the sentinel cell ``-1`` inside the kernel instead of a
    separate Catalyst filter, so the single drift rollup also yields
    ``n_dropped`` and the old per-append ``count()`` job is gone. The
    drift-vs-build comparison reads the ``{table}_drift_stats``
    companion unless ``build_stats=(mean, p95)`` is passed — streaming
    ingest resolves it once per held centroid fingerprint instead of
    one ``first()`` job per micro-batch (it rotates exactly when the
    matrix does, so the fingerprint resync is the right invalidation
    point).
    """
    from ..sources.io import write_table

    if centroids is None:
        # no-driver-state form: resolve the CURRENT matrix from the
        # persisted companion (also how appenders resume after a
        # maintenance retrain rotated it)
        centroids = ivf_load_centroids(new_vectors.sparkSession, table)
    _check_centroids(new_vectors.sparkSession, table, centroids)
    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]
    # grid-built indexes store centroids in quantized units (see
    # ivf_build_index impl="grid"): re-quantize batch vectors to match
    # before the nearest-centroid assignment
    from ..sources.io import get_table_meta

    _meta = get_table_meta(new_vectors.sparkSession, table)
    _is_grid = _meta.get("impl") == "grid"
    # indexes built since the id-bucketed layout landed record their
    # bucket spec; appends MUST match it (Spark rejects an unbucketed
    # append into a bucketed table). Pre-bucketing indexes record none
    # and keep appending plain cell-partitioned files.
    _n_id_buckets = int(_meta.get("n_buckets", 0) or 0)
    _id_bucket_spec = (
        (_n_id_buckets, _meta["bucket_cols"].split(","))
        if _n_id_buckets and "bucket_cols" in _meta
        else None
    )

    if _is_grid:
        # size(NULL) is NULL, so this single predicate drops NULL and
        # ragged vectors alike before they reach the assignment
        n_input = new_vectors.count()
        valid = new_vectors.filter(F.size(F.col(vec_col)) == dim)
        # grid indexes assign through the SAME exact Catalyst path the
        # build used (quantized fold, (d, cell) tie-break) — so an
        # appended index is bit-identical to building over the union,
        # and the x1_ann_stream oracle can replay appends exactly
        stats_src = assigned = (
            grid_assign_cells(valid, id_col, vec_col, centroids, keep_cols=[vec_col])
            .drop("_vq")
            .withColumnRenamed("cell", "_cell")
            .select(F.col(id_col), F.col(vec_col), F.col("_cell"))
            .localCheckpoint(eager=True)
        )
    else:
        n_input = None  # derived from the drift rollup (r17: one fewer job)

        @pandas_udf("int")
        def nearest_cell(vecs: pd.Series) -> pd.Series:
            # invalid rows (NULL / wrong-dim — the same rows the old
            # Catalyst `size(vec) == dim` filter dropped) assign to the
            # sentinel cell -1, so ONE checkpointed pass yields the
            # write set, the drift stats AND the dropped-row count —
            # the per-batch count job this replaced measured ~0.1 s of
            # pure scheduling overhead in the streaming steady state
            out = np.full(len(vecs), -1, dtype=np.int32)
            ok = [
                i for i, v in enumerate(vecs)
                if v is not None and len(v) == dim
            ]
            if ok:
                V = np.stack(
                    [np.asarray(vecs.iloc[i], dtype=np.float64) for i in ok]
                )
                d = (V**2).sum(1)[:, None] - 2 * V @ C.T + (C**2).sum(1)[None, :]
                out[np.asarray(ok)] = np.argmin(d, axis=1).astype("int32")
            return pd.Series(out)

        # one narrow checkpoint so the assignment kernel runs once for
        # the write AND the drift agg (batch-sized, not corpus-sized)
        stats_src = new_vectors.select(
            F.col(id_col),
            F.col(vec_col),
            nearest_cell(F.col(vec_col)).alias("_cell"),
        ).localCheckpoint(eager=True)
        assigned = stats_src.filter(F.col("_cell") >= 0)
    to_write = assigned
    spark = new_vectors.sparkSession
    index_has_codes = "pq_code" in spark.table(table).columns
    if index_has_codes and pq_codebook is None:
        # resolve the build's persisted companion (bit-identical to
        # the trained object) before giving up — the codebook twin of
        # centroids=None resolution above
        try:
            pq_codebook = pq_load_codebook(spark, table)
        except Exception:
            raise ValueError(
                f"{table} stores PQ codes (built with pq_codebook=...) "
                f"and has no {_pq_codebook_table(table)} companion to "
                "resolve; appends must pass the SAME codebook so new "
                "rows carry codes"
            )
    if pq_codebook is not None:
        if not index_has_codes:
            raise ValueError(
                f"{table} has no pq_code column; pass pq_codebook only "
                "for indexes built with one"
            )
        to_write = pq_encode(assigned, pq_codebook, vec_col=vec_col)
    write_table(
        to_write,
        table,
        mode="append",
        partition_by=["_cell"],
        bucket_by=_id_bucket_spec,
    )

    _dv = _quantized_vec(vec_col, "grid" if _is_grid else "mllib")
    # ONE aggregation job for both the global drift stats and the
    # per-cell skew: rollup("_cell") emits every per-cell row PLUS the
    # grand-total grouping set (grouping()=1) — _cell is never NULL by
    # construction, but the grouping flag is what distinguishes the
    # total, not the NULL marker. Was two jobs per append before r16;
    # in the streaming steady state every per-batch job is overhead.
    # r17: the mllib path's sentinel-cell (-1) rows ride the SAME
    # rollup — their NULL-guarded _dist keeps mean/p95 identical to
    # the old valid-only aggregation (avg/approx_percentile ignore
    # NULLs), and their group's n IS the old n_dropped.
    stats_rows = (
        stats_src.withColumn("_qv", _dv)
        .withColumn(
            "_dist",
            F.when(
                F.col("_cell") >= 0, _centroid_dist("_qv", "_cell", centroids)
            ),
        )
        .rollup("_cell")
        .agg(
            F.avg("_dist").alias("mean_dist"),
            F.expr("approx_percentile(_dist, 0.95, 10000)").alias("p95_dist"),
            F.count("*").alias("n"),
            F.grouping("_cell").alias("_is_total"),
        )
        .collect()
    )
    row = next((r for r in stats_rows if r["_is_total"] == 1), None)
    if row is None:  # empty grouping-set output (no input rows at all)
        row = {"mean_dist": None, "p95_dist": None, "n": 0}
    n_invalid = sum(
        r["n"] for r in stats_rows
        if r["_is_total"] == 0 and r["_cell"] == -1
    )
    if n_input is None:
        n_input = row["n"]  # mllib path: sentinel rows make the rollup total
    cell_rows = [
        r for r in stats_rows if r["_is_total"] == 0 and r["_cell"] != -1
    ]
    if build_stats is not None:
        build_mean, build_p95 = build_stats
    else:
        build_mean = build_p95 = None
        try:
            srow = spark.table(_drift_stats_table(table)).first()
            if srow is not None:
                build_mean, build_p95 = srow["mean_dist"], srow["p95_dist"]
        except Exception:
            pass  # pre-stats index: drift unmeasurable, never fail append
    batch_p95 = row["p95_dist"]
    drift_ratio = (
        batch_p95 / build_p95 if batch_p95 is not None and build_p95 else None
    )
    # the batch's CELL SKEW — what fraction crammed into its single
    # hottest cell — is the signal that distinguishes LOCALIZED drift
    # (an out-of-distribution blob whose vectors all bin to one nearest
    # old cell: ivf_split_hot_cells fixes it by rewriting only that
    # partition) from GLOBAL drift (far-from-centroid vectors spread
    # across many cells: only a full ivf_retrain_index helps).
    # maintenance.table_health reads it off the log to CHOOSE the
    # remediation. cell_rows came free with the rollup above.
    n_assigned = sum(r["n"] for r in cell_rows)
    top = (
        max(cell_rows, key=lambda r: (r["n"], -r["_cell"]))
        if cell_rows
        else None
    )
    n_appended = row["n"] - n_invalid
    report = {
        "n_appended": n_appended,
        "n_dropped": n_input - n_appended,
        "batch_mean_dist": row["mean_dist"],
        "batch_p95_dist": batch_p95,
        "build_mean_dist": build_mean,
        "build_p95_dist": build_p95,
        "drift_ratio": drift_ratio,
        "rebuild_recommended": bool(
            drift_ratio is not None and drift_ratio > drift_threshold
        ),
        "batch_top_cell": int(top["_cell"]) if top is not None else None,
        "batch_top_cell_fraction": (
            top["n"] / n_assigned if top is not None and n_assigned else None
        ),
        "batch_n_cells": len(cell_rows),
    }
    if log_drift:
        ivf_append_drift_reports(spark, table, [report])
    return report


def ivf_append_drift_reports(spark, table: str, reports: list[dict]) -> None:
    """Append :func:`ivf_append_index` report dict(s) to the
    ``{table}_drift_log`` companion in ONE write job. The batch form
    exists for the streaming ingest (``stream_ivf_append``), which
    buffers its per-micro-batch reports and flushes them post-drain —
    one companion write per RUN instead of one per batch (the 1-row
    write was a whole Spark job of per-batch overhead in the steady
    state). The log is advisory (it drives ``retrain_recommended``,
    never correctness), so a crash losing an unflushed buffer only
    delays the flag until future appends re-measure the drift."""
    if not reports:
        return
    from ..sources.io import write_table

    log_row = spark.createDataFrame(
        [
            (
                int(r["n_appended"]),
                int(r["n_dropped"]),
                r["batch_mean_dist"],
                r["batch_p95_dist"],
                r["drift_ratio"],
                bool(r["rebuild_recommended"]),
                r["batch_top_cell"],
                r["batch_top_cell_fraction"],
                int(r["batch_n_cells"]),
            )
            for r in reports
        ],
        "n_appended bigint, n_dropped bigint, batch_mean_dist double, "
        "batch_p95_dist double, drift_ratio double, "
        "rebuild_recommended boolean, batch_top_cell int, "
        "batch_top_cell_fraction double, batch_n_cells int",
    ).withColumn("logged_at", F.current_timestamp())
    tgt = _drift_log_table(table)
    # a LEGACY log (written before the skew columns existed) keeps
    # its narrower schema — saveAsTable append rejects new columns,
    # and widening someone's standing log in place is not ours to do
    if spark.catalog.tableExists(tgt):
        have = set(spark.table(tgt).columns)
        missing = [c for c in log_row.columns if c not in have]
        if missing:
            log_row = log_row.drop(*missing)
    # through write_table for the orphan-directory retry: a prior
    # session's dropped index can leave an unregistered
    # {table}_drift_log directory behind, and a raw saveAsTable
    # append would die on LOCATION_ALREADY_EXISTS
    write_table(log_row, tgt, mode="append")


def ivf_retrain_index(
    spark,
    table: str,
    n_clusters: int | None = None,
    seed: int = 42,
    pq_codebook: "PQCodebook | None" = None,
    n_id_buckets: int | None = None,
) -> list[list[float]]:
    """The quantizer-drift REMEDIATION :func:`ivf_append_index`'s
    report recommends: re-fit the coarse quantizer over the standing
    index's CURRENT contents (old + every streamed append), re-assign
    every vector to the new cells, and swap the rebuilt layout into
    place — recall decayed by out-of-distribution appends is restored
    because the new centroids cover where the data actually lives now.
    Everything is read off the table itself: no raw-corpus access, no
    caller-held state. Cost = one bounded-sample fit + one assignment
    pass + one write — the same shape as the original build.

    Parameters default from the table's recorded contract
    (``n_clusters`` / ``impl`` / id-bucket spec), so
    ``ivf_retrain_index(spark, table)`` is the whole runbook call;
    PQ-coded indexes must pass the SAME codebook the build used (codes
    are re-derived for the new layout). The rebuild is fail-safe
    (``write_table``'s stage-then-swap) and updates the recorded
    centroid fingerprint, so probes still holding the PRE-drift
    centroid matrix are REJECTED rather than silently probing the
    wrong cells — callers pick up the returned matrix. The
    ``{table}_drift_log`` companion is cleared, resetting
    ``maintenance.table_health``'s ``retrain_recommended`` flag; the
    build-time ``{table}_drift_stats`` baseline is re-recorded by the
    rebuild so future appends measure drift against the NEW quantizer.
    """
    from ..sources.io import get_table_meta

    meta = get_table_meta(spark, table)
    if meta.get("kind") != "ivf":
        raise ValueError(
            f"{table!r} is not an IVF index (kind={meta.get('kind')!r})"
        )
    _refuse_pending_merge(spark, table, "a retrain")
    if meta.get("pq") == "true" and pq_codebook is None:
        try:
            pq_codebook = pq_load_codebook(spark, table)
        except Exception:
            raise ValueError(
                f"{table} stores PQ codes and has no "
                f"{_pq_codebook_table(table)} companion to resolve; "
                "retrain must pass the SAME codebook so rebuilt rows "
                "carry codes"
            )
    k = n_clusters or int(meta.get("n_clusters", 16))
    impl = meta.get("impl", "mllib")
    nb = n_id_buckets or int(meta.get("n_buckets", 0) or 8)
    # build writes (id_col, vec_col, _cell[, pq_code]) in that order —
    # the column order IS the contract (names are caller-chosen)
    cols = spark.table(table).columns
    id_col, vec_col = cols[0], cols[1]
    # materialize the corpus before the swap: the rebuild overwrites
    # the very table this plan reads
    corpus = (
        spark.table(table).select(id_col, vec_col).localCheckpoint(eager=True)
    )
    centroids = ivf_build_index(
        corpus,
        table,
        n_clusters=k,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        pq_codebook=pq_codebook,
        impl=impl,
        n_id_buckets=nb,
    )
    spark.sql(f"DROP TABLE IF EXISTS {_drift_log_table(table)}")
    return centroids


def ivf_split_hot_cells(
    spark,
    table: str,
    max_cell_fraction: float = 0.25,
    seed: int = 42,
    fit_target_rows: int = 100_000,
    rounds: int = 1,
    max_cells: int | None = None,
) -> list[list[float]]:
    """The INCREMENTAL drift remediation: split only the cells that
    got hot, touching only their partitions. Where
    :func:`ivf_retrain_index` re-fits and rewrites the WHOLE index
    (one fit + one assignment pass + one full write — the right call
    when the quantizer is globally stale), a drifted ingest more often
    produces one or two overfull cells (every out-of-distribution
    vector crams into its nearest old cell); splitting those in place
    costs a bounded 2-means fit per hot cell plus a DYNAMIC PARTITION
    OVERWRITE of just the hot and newly-created cell directories — at
    100 TB that is a rewrite of the skewed percent, not the corpus.
    Untouched cells' files are left byte-identical (pinned by test),
    and the id-bucket spec is preserved because ``insertInto`` on a
    bucketed catalog table writes bucket-aligned files (also pinned).

    Mechanics per hot cell (row count > ``max_cell_fraction`` × index
    rows, needs ≥ 2 rows): fit k=2 on the cell's own vectors, impl-aware
    — grid cells re-fit with the deterministic trainer in quantized
    units over ALL of the cell's rows by design (the full-cell fit is
    what makes the DuckDB oracle replay exact; a hot cell is already a
    bounded fraction of the index), mllib cells with seeded KMeans on a
    ``fit_target_rows``-bounded sample (the only sample-bounded path);
    child
    A keeps the old cell id, child B appends as cell ``len(matrix)``;
    a split where one child ends up empty (all-identical vectors) is
    skipped. PQ codes ride along untouched — they encode the vector,
    not the cell. Finishes by rotating the index contract
    (:func:`_finalize_index_contract`): new ``{table}_centroids``
    companion + fingerprint (stale matrices rejected), fresh drift
    baseline, cleared drift log. Returns the new centroid matrix;
    probes pick it up via :func:`ivf_load_centroids`.

    CRASH RECOVERY (round 17 audit): a split killed between its child
    write and the contract rotation strands the child partition beyond
    the matrix — invisible to every probe. Every split therefore
    begins by ADOPTING stranded cells (:func:`_adopt_stranded_cells`:
    re-attach each with its own mean vector, force the rotation), and
    :func:`ivf_adopt_stranded_cells` is the adoption-only recovery
    verb ``maintenance.run_maintenance`` applies when ``table_health``
    reports ``stranded_cells``.

    One pass may leave a CHILD still over the fraction (a 70% cell
    splitting 40/30 against a 0.25 bound): ``rounds > 1`` re-detects
    and re-splits until no cell is hot, every split produced no
    progress (all degenerate), or the round budget runs out — each
    extra round touches only the still-hot partitions, so cost stays
    proportional to the remaining skew. If nothing split at all, the
    contract is left untouched (no fingerprint rotation).

    ``max_cells`` bounds centroid-matrix growth: splits only ever
    APPEND a cell, so a long-lived drifting ingest that is repeatedly
    split would grow k without bound — and every probe's nearest-cell
    argmin and every :func:`ivf_query_index` broadcast carries the
    full matrix. Splitting stops (mid-round if need be) once the
    matrix reaches ``max_cells``; ``maintenance.run_maintenance``
    derives it from the recorded ``base_n_clusters`` (the k of the
    last full fit) and ESCALATES to :func:`ivf_retrain_index` at the
    base k when the budget is exhausted — the fit-everything
    remediation is also the one that resets k.
    """
    from ..sources.io import get_table_meta

    meta = get_table_meta(spark, table)
    if meta.get("kind") != "ivf":
        raise ValueError(
            f"{table!r} is not an IVF index (kind={meta.get('kind')!r})"
        )
    _refuse_pending_merge(spark, table, "a hot-cell split")
    centroids = [list(c) for c in ivf_load_centroids(spark, table)]
    impl = meta.get("impl", "mllib")
    # `or 0`, matching ivf_append_index: a legacy pre-bucketing index
    # has unbucketed files, and recording a fabricated spec here would
    # poison every later append (bucketed append into unbucketed files)
    n_id_buckets = int(meta.get("n_buckets", 0) or 0)
    cols = spark.table(table).columns
    id_col, vec_col = cols[0], cols[1]
    data_cols = [c for c in cols if c != "_cell"]

    # adopt any STRANDED cells first (partition ids beyond the recorded
    # matrix — a previous split crashed between its child-partition
    # write and the contract rotation, leaving those rows invisible to
    # every probe and, were one hot, an index error waiting in the loop
    # below). Adoption extends the matrix with the stranded partitions'
    # own mean vectors and forces the finalize, restoring visibility.
    centroids, adopted = _adopt_stranded_cells(
        spark, table, centroids, impl, vec_col
    )
    changed = bool(adopted)
    budget_hit = False
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for _ in range(max(1, rounds)):
            if budget_hit:
                break
            spark.catalog.refreshTable(table)
            sizes = {
                r["_cell"]: r["n"]
                for r in spark.table(table)
                .groupBy("_cell")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            total = sum(sizes.values())
            hot = sorted(
                c
                for c, n in sizes.items()
                if total and n > max_cell_fraction * total and n >= 2
            )
            if not hot:
                break
            round_changed = False
            for cell in hot:
                if max_cells is not None and len(centroids) >= max_cells:
                    budget_hit = True
                    break
                rows_c = spark.table(table).filter(F.col("_cell") == cell)
                if impl == "grid":
                    sub = grid_kmeans_fit(
                        rows_c, id_col, vec_col, k=2, iters=2
                    )
                    assigned = (
                        grid_assign_cells(
                            rows_c,
                            id_col,
                            vec_col,
                            sub,
                            keep_cols=[c for c in data_cols if c != id_col],
                        )
                        .drop("_vq")
                        .withColumnRenamed("cell", "_child")
                    )
                else:
                    from pyspark.ml.clustering import KMeans
                    from pyspark.ml.functions import array_to_vector

                    c_vec = rows_c.withColumn(
                        "_v", array_to_vector(F.col(vec_col))
                    )
                    fit_df = _bounded_fit(c_vec, None, seed, fit_target_rows)
                    model = KMeans(
                        k=2, seed=seed, featuresCol="_v",
                        predictionCol="_child",
                    ).fit(fit_df)
                    assigned = model.transform(c_vec).drop("_v")
                    sub = [
                        list(map(float, ct)) for ct in model.clusterCenters()
                    ]
                assigned = assigned.localCheckpoint(eager=True)
                counts = {
                    r["_child"]: r["n"]
                    for r in assigned.groupBy("_child")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
                if len(counts) < 2:
                    # degenerate cell (all-identical vectors): nothing
                    # to split; keep the old centroid and move on
                    continue
                new_id = len(centroids)
                out = assigned.select(
                    *data_cols,
                    F.when(F.col("_child") == 0, F.lit(cell))
                    .otherwise(F.lit(new_id))
                    .cast("int")
                    .alias("_cell"),
                )
                # positional insert: out's column order matches the
                # table (data cols in table order, partition col last)
                out.write.mode("overwrite").insertInto(table)
                centroids[cell] = list(sub[0])
                centroids.append(list(sub[1]))
                round_changed = changed = True
            if not round_changed:
                break  # every hot cell degenerate: no progress possible
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
    if not changed:
        return centroids
    spark.catalog.refreshTable(table)
    _finalize_index_contract(
        spark,
        table,
        centroids,
        impl=impl,
        pq=meta.get("pq") == "true",
        n_id_buckets=n_id_buckets,
        id_col=id_col,
        vec_col=vec_col,
    )
    return centroids


def _adopt_stranded_cells(
    spark,
    table: str,
    centroids: list[list[float]],
    impl: str,
    vec_col: str,
) -> tuple[list[list[float]], list[int]]:
    """Adopt STRANDED cells — partition ids at/beyond the recorded
    matrix length. The one way these arise is a hot-cell split crashing
    between its child-partition write and the contract rotation: the
    child rows live under ``_cell = old_k`` but the matrix still has
    ``old_k`` slots, so no probe ever routes there (silent recall
    loss) and a later split that found the stranded cell hot would
    index past the matrix. Recovery is positional adoption: stranded
    ids are contiguous from ``len(centroids)`` (children are appended
    sequentially), and each adopted centroid is the partition's own
    per-dimension mean — for a converged 2-means child that IS its
    center, and the matrix entry is only a probe-routing hint either
    way. Grid-impl means are taken in quantized units, matching the
    rest of the grid contract (:func:`_quantized_vec`). Empty stranded
    partitions (a crash after the directory was created but before
    rows landed) are simply dropped.

    The SAME mean pass also refreshes every in-range cell that has
    rows (round 17 review): the crashed split rewrote its parent
    cell's rows (child A) but the matrix update recording the new
    parent centroid was lost with the crash, so the recorded centroid
    is the mean of BOTH modes — queries near the surviving mode could
    rank other cells ahead of it at realistic ``n_probe``. Since the
    matrix entry is only a probe-routing hint, each present cell's
    current mean is the best available value (a Lloyd position update
    without reassignment; for unsplit cells the mean is what KMeans
    recorded anyway, up to fit sampling). Cells with no partition keep
    their recorded centroid. This runs ONLY when something is stranded
    — a healthy split never takes this path, so oracle-replayed
    matrices are untouched.

    Returns (extended_matrix, adopted_ids); the caller must finalize
    the contract when any were adopted. Raises (with retrain advice)
    on non-contiguous stranded ids — unreachable through this
    library's own verbs, but adopting positionally past a gap would
    mis-route every probe."""
    present = _cell_partition_ids(spark, table)
    stranded = sorted(c for c in present if c >= len(centroids))
    if not stranded:
        return centroids, []
    dim = len(centroids[0])
    qv = _quantized_vec(vec_col, impl)
    stats = {
        r["_cell"]: r
        for r in spark.table(table)
        .select(F.col("_cell"), qv.alias("_v"))
        .groupBy("_cell")
        .agg(
            *[
                F.avg(F.element_at("_v", d + 1)).alias(f"m{d}")
                for d in range(dim)
            ]
        )
        .collect()
    }
    empty = [s for s in stranded if s not in stats]
    if empty:
        _drop_cell_partitions(spark, table, empty)
    live = [s for s in stranded if s in stats]
    out = [
        [float(stats[c][f"m{d}"]) for d in range(dim)]
        if c in stats
        else list(cent)
        for c, cent in enumerate(centroids)
    ]
    for s in live:
        if s != len(out):
            raise ValueError(
                f"stranded cells {live} of {table} are not contiguous "
                f"with the matrix (k={len(centroids)}); positional "
                "adoption would mis-route probes — run ivf_retrain_index"
            )
        out.append([float(stats[s][f"m{d}"]) for d in range(dim)])
    return out, live


def ivf_adopt_stranded_cells(spark, table: str) -> list[list[float]]:
    """Recovery verb for the split's crash window: re-attach any
    stranded cell partitions (see :func:`_adopt_stranded_cells`) and
    rotate the contract, WITHOUT splitting anything new —
    ``max_cell_fraction=2.0`` can never flag a hot cell, so the call
    is adoption + finalize only. ``maintenance.table_health`` reports
    ``stranded_cells`` and ``run_maintenance`` applies this verb under
    the ``retrain_ivf`` opt-in (it rotates the matrix like the other
    remediations). Idempotent: a table with nothing stranded returns
    the matrix unchanged without rotating."""
    return ivf_split_hot_cells(spark, table, max_cell_fraction=2.0)


def _merge_manifest_table(table: str) -> str:
    return f"{table}_merge_manifest"


def _refuse_pending_merge(spark, table: str, verb: str) -> None:
    """Matrix-rotating verbs that READ the existing layout must not run
    over a crashed merge's pending manifest: the half-merged table can
    hold cold rows both in their original partitions and folded into
    survivors, and a retrain/split would reassign BOTH copies — baking
    the duplication into the rebuilt index permanently. Resume the
    merge first (``ivf_merge_cold_cells`` picks the recorded plan back
    up; ``run_maintenance`` orders it before drift remediation)."""
    if spark.catalog.tableExists(_merge_manifest_table(table)):
        raise ValueError(
            f"{table} has a pending {_merge_manifest_table(table)} (a "
            f"prior ivf_merge_cold_cells crashed mid-plan); {verb} over "
            "the half-merged layout would bake duplicated rows into the "
            "rebuilt index — resume the merge first (ivf_merge_cold_cells"
            " or run_maintenance with retrain_ivf=True)"
        )


def _merge_fold_marker_table(table: str) -> str:
    return f"{table}_merge_fold_done"


def _drop_merge_manifest(spark, table: str) -> None:
    """Retire a merge plan: marker FIRST, manifest second. A crash
    between the two leaves manifest-without-marker (the next call
    resumes through the idempotent repair fold, a no-op once the cold
    partitions are gone) — never marker-without-manifest, which would
    suppress a future merge's fold."""
    spark.sql(f"DROP TABLE IF EXISTS {_merge_fold_marker_table(table)}")
    spark.sql(f"DROP TABLE IF EXISTS {_merge_manifest_table(table)}")


def _merge_manifest_resumable(spark, table: str) -> bool:
    """True when a pending merge manifest exists AND is valid to
    resume: the table's recorded centroid fingerprint still matches
    the matrix the plan was decided against — the pre-merge print
    (rotation not yet committed) or the post-merge one (a crash landed
    after finalize's meta write). A manifest predating the fingerprint
    columns is treated as RESUMABLE (resuming a legacy plan is the
    safe default; retiring it and re-deciding from the half-mutated
    table is the round-16 duplication bug). With build/retrain/split
    all refusing to rotate over a pending manifest, a mismatch here
    means out-of-band interference (manual meta edits, restored
    backups) — defense-in-depth, not a normal path. Shared with
    ``maintenance.run_maintenance`` so the applied report can tell a
    resumed merge from a retired stale plan."""
    man_t = _merge_manifest_table(table)
    if not spark.catalog.tableExists(man_t):
        return False
    man = spark.table(man_t).first().asDict()
    if man.get("pre_fp") is None and man.get("post_fp") is None:
        return True
    from ..sources.io import get_table_meta

    recorded = get_table_meta(spark, table).get("centroid_fp")
    return recorded in (man.get("pre_fp"), man.get("post_fp"))


def _mark_fold_done(spark, table: str) -> None:
    """Commit point between the fold and the cold-partition drops: the
    marker's existence is what lets a resume distinguish 'moved rows
    all appended' (skip the fold) from 'append may be partial' (run
    the anti-join repair). Module-level so the crash-safety tests can
    fault-inject it. Append-mode creation of a fresh single-row table:
    the marker is either absent (resume repairs — safe) or present
    (append completed first — safe); there is no torn middle state the
    way an overwrite of the manifest itself would have."""
    from ..sources.io import write_table

    write_table(
        spark.createDataFrame([(1,)], "done int"),
        _merge_fold_marker_table(table),
        mode="append",
    )


def _merge_renumber_plan(
    cold: list[int], survivors: list[int]
) -> list[tuple[int, int]]:
    """The swap-remove renumbering plan, decided up front in closed
    form: holes (retired ids) below S=|survivors| ascending pair with
    survivor ids >= S descending. Provably the sequential
    swap-remove loop's outcome — hole and source slots are disjoint,
    so the batched application equals the sequential one (property-
    tested against a step-by-step simulation in
    tests/test_merge_plan_properties.py)."""
    holes, live = list(cold), sorted(survivors)
    moves: list[tuple[int, int]] = []
    while holes and live and live[-1] > holes[0]:
        moves.append((holes.pop(0), live.pop()))
    return moves


def _merged_matrix(
    centroids: list[list[float]],
    moves: list[tuple[int, int]],
    survivors: list[int],
) -> list[list[float]]:
    """The post-merge centroid matrix, in closed form from the decided
    plan: hole ``h`` takes source ``m``'s centroid (written holes and
    read survivors are disjoint, so the mapping applies from the
    ORIGINAL matrix regardless of order), then truncate to the survivor
    count. Deterministic, so the manifest can record the post-merge
    fingerprint up front."""
    new_centroids = [list(c) for c in centroids]
    for h, m in moves:
        new_centroids[h] = list(centroids[m])
    return new_centroids[: len(survivors)]


def _cell_partition_ids(spark, table: str) -> set[int]:
    """Cell ids that currently have a partition directory — one
    constant-time ``SHOW PARTITIONS`` (metadata listing, no scan)."""
    return {
        int(r[0].split("_cell=", 1)[1])
        for r in spark.sql(f"SHOW PARTITIONS {table}").collect()
    }


def _drop_cell_partitions(spark, table: str, cells: list[int]) -> None:
    """Drop a set of cell partitions in ONE metadata statement (not a
    per-cell loop — the statement is the atom the merge's crash story
    counts, so fewer statements = fewer crash windows). Module-level so
    the crash-safety tests can fault-inject it."""
    if not cells:
        return
    specs = ", ".join(f"PARTITION (_cell={c})" for c in sorted(cells))
    spark.sql(f"ALTER TABLE {table} DROP IF EXISTS {specs}")


def _merge_fold_cold_rows(
    spark,
    table: str,
    cold: list[int],
    survivors: list[int],
    centroids: list[list[float]],
    impl: str,
    data_cols: list[str],
    id_col: str,
    vec_col: str,
    repair: bool = False,
) -> None:
    """Phase 1 of the merge: re-assign every row of the still-present
    cold partitions to its nearest SURVIVING cell and fold it in.

    Clean path (``repair=False``): ONE append of just the moved rows —
    cold cells are slivers by definition, so the fold costs the sliver,
    never a destination-partition rewrite (a cold sliver folding into
    the corpus's largest cell must not rewrite that whole partition).
    Crash safety comes from the caller's ``{table}_merge_fold_done``
    marker, written immediately AFTER this append: a resume that finds
    the marker skips the fold entirely (the append committed), and one
    that doesn't runs the repair path.

    Repair path (``repair=True`` — resuming a manifest with no marker,
    i.e. the append may have landed partially or fully without its
    commit marker): each destination partition is rewritten as

        (its current rows ANTI-JOINED on id against the moved rows)
        UNION (the moved rows)

    which strips any previously appended copies before folding again —
    the destination converges to exactly one copy per id no matter how
    many times the fold crashed mid-append. The assignment itself is
    deterministic (same kernel, same survivor matrix), which is what
    makes the recomputation safe. The rewrite is repair-only by design:
    round 17's first cut ran it on EVERY merge, turning a sliver fold
    into a potential full-corpus rewrite (VERDICT r17 review).
    """
    present = sorted(set(cold) & _cell_partition_ids(spark, table))
    if not present:
        return  # fold already completed (or every cold cell was empty)
    cold_rows = spark.table(table).filter(F.col("_cell").isin(present))
    if impl == "grid":
        surv_cents = [centroids[c] for c in survivors]
        moved = (
            grid_assign_cells(
                cold_rows,
                id_col,
                vec_col,
                surv_cents,
                keep_cols=[c for c in data_cols if c != id_col],
            )
            .drop("_vq")
            .withColumnRenamed("cell", "_surv_pos")
        )
    else:
        C = np.asarray([centroids[c] for c in survivors], dtype=np.float64)

        @pandas_udf("int")
        def nearest_surv(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:
                return pd.Series([], dtype="int32")
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            d = (V**2).sum(1)[:, None] - 2 * V @ C.T + (C**2).sum(1)[None, :]
            return pd.Series(np.argmin(d, axis=1).astype("int32"))

        moved = cold_rows.select(
            *data_cols, nearest_surv(F.col(vec_col)).alias("_surv_pos")
        )
    pos_to_cell = F.create_map(
        *[F.lit(x) for i, c in enumerate(survivors) for x in (i, c)]
    )
    # checkpoint BEFORE the write: the fold writes the very table the
    # assignment reads (self-read hazard, same reason the split
    # checkpoints its assignment)
    moved = moved.select(
        *data_cols,
        pos_to_cell[F.col("_surv_pos")].cast("int").alias("_cell"),
    ).localCheckpoint(eager=True)
    if not repair:
        # positional insert: data cols in table order, partition col
        # last — appends only the sliver rows, never a dest rewrite
        moved.write.mode("append").insertInto(table)
        return
    dest = sorted(
        r["_cell"] for r in moved.select("_cell").distinct().collect()
    )  # bounded by |survivors| <= k
    existing = (
        spark.table(table)
        .filter(F.col("_cell").isin(dest))
        .join(moved.select(id_col), on=id_col, how="left_anti")
        .select(*data_cols, "_cell")
    )
    payload = (
        existing.unionByName(moved)
        .select(*data_cols, F.col("_cell").cast("int").alias("_cell"))
        .localCheckpoint(eager=True)
    )
    payload.write.mode("overwrite").insertInto(table)


def _merge_renumber_holes(
    spark,
    table: str,
    moves: list[tuple[int, int]],
    data_cols: list[str],
) -> None:
    """Phase 2: restore the dense 0..k-1 cell-id invariant by
    swap-remove — each hole (a retired id below S=|survivors|) is
    filled by the highest surviving id. ONE dynamic-overwrite job for
    ALL moved partitions (round 16 ran one Spark job per hole — the
    driver-side sequential loop VERDICT r16 flagged) plus one metadata
    drop statement. IDEMPOTENT: overwriting hole ``h`` with the rows
    of source ``m`` converges as long as ``m``'s partition still
    exists, and sources whose partition is already gone were fully
    processed (their holes hold the rows), so a resume re-runs only
    the remaining pairs."""
    pending = [
        (h, m) for h, m in moves if m in _cell_partition_ids(spark, table)
    ]
    if not pending:
        return
    src_to_hole = F.create_map(
        *[F.lit(x) for h, m in pending for x in (m, h)]
    )
    movers = (
        spark.table(table)
        .filter(F.col("_cell").isin([m for _, m in pending]))
        .select(
            *data_cols, src_to_hole[F.col("_cell")].cast("int").alias("_cell")
        )
        .localCheckpoint(eager=True)
    )
    movers.write.mode("overwrite").insertInto(table)
    _drop_cell_partitions(spark, table, [m for _, m in pending])


def ivf_merge_cold_cells(
    spark,
    table: str,
    min_cell_fraction: float = 0.01,
) -> list[list[float]]:
    """The defragmentation counterpart of :func:`ivf_split_hot_cells`:
    RETIRE cells that went cold (row count < ``min_cell_fraction`` ×
    index rows — the aftermath of deletes, compaction-era data aging
    out, or a retrain-then-drift cycle leaving stranded slivers) and
    fold their rows into the nearest SURVIVING cell. Where the split
    bounds k from above (with maintenance's budget), the merge pulls k
    back down when the matrix has fragmented — every probe's
    nearest-cell argmin and every broadcast carries the full matrix,
    and a directory layout of sliver partitions wastes listing and
    min-file overhead at scale. ``maintenance.table_health`` flags the
    fragmentation as ``merge_recommended`` and ``run_maintenance``
    applies this verb under the same ``retrain_ivf`` opt-in as the
    other matrix-rotating remediations.

    Partition-scoped like the split: the cold rows (small by
    definition) are re-assigned with one bounded kernel pass, the
    destination partitions are rewritten once (dynamic partition
    overwrite), the cold partitions are dropped, and the dense 0..k-1
    cell-id invariant (what lets the matrix be positional everywhere)
    is restored by swap-remove renumbering — ONE job rewriting all
    moved partitions, never a corpus rewrite. PQ codes ride through
    untouched — they encode the vector, not the cell. Ends with the
    same contract rotation as build/retrain/split (fingerprint,
    centroid companion, fresh drift baseline, cleared log); a merge
    that finds nothing cold leaves the contract untouched and returns
    the matrix unchanged.

    CRASH-SAFE and idempotent (round 17 — the round-16 fold appended
    cold rows before dropping the cold partitions, so a crash between
    the two duplicated every cold row and a re-run doubled it): the
    decided plan (cold cells, survivors, renumber moves, pre/post
    fingerprints) is persisted to a ``{table}_merge_manifest``
    companion BEFORE any mutation — the same pending-manifest pattern
    as the batch-sink fold. The clean-path fold stays the cheap
    moved-row APPEND (a sliver fold must not rewrite its destination
    partition), committed by a ``{table}_merge_fold_done`` marker;
    a resume without the marker runs the anti-join repair rewrite
    instead (strips any partially appended copies), and every later
    phase is individually re-runnable (renumber = overwrite-then-drop,
    finalize = rewrite). A merge invoked while a manifest is pending
    RESUMES the recorded plan instead of re-deciding from the
    half-mutated table — but ONLY while the table still carries the
    matrix the plan was decided against (pre- or post-merge
    fingerprint; legacy manifests without fingerprints resume
    unconditionally); out-of-band interference having rotated the
    matrix retires the manifest and the merge re-decides fresh.
    ``ivf_build_index`` / ``ivf_retrain_index`` /
    ``ivf_split_hot_cells`` ALL refuse to rotate over a pending
    manifest (a retrain/split would bake the half-folded duplicates
    into the rebuilt layout; a rebuild crashing before it could retire
    the plan would leave it resumable against brand-new rows) — resume
    the merge first, it converges from any crash state.
    ``maintenance.run_maintenance`` resumes a pending merge BEFORE
    considering drift remediation for the same reason. The manifest is
    dropped only after the contract rotation commits.

    Raises if the fraction would retire EVERY cell (fraction ≥ 1/k
    territory) — a merge must leave at least one survivor."""
    from ..sources.io import get_table_meta, write_table

    import json

    meta = get_table_meta(spark, table)
    if meta.get("kind") != "ivf":
        raise ValueError(
            f"{table!r} is not an IVF index (kind={meta.get('kind')!r})"
        )
    impl = meta.get("impl", "mllib")
    n_id_buckets = int(meta.get("n_buckets", 0) or 0)
    cols = spark.table(table).columns
    id_col, vec_col = cols[0], cols[1]
    data_cols = [c for c in cols if c != "_cell"]

    man_t = _merge_manifest_table(table)
    resuming = False
    if spark.catalog.tableExists(man_t):
        # STALENESS GUARD (round 17 review): resume only while the
        # table still carries the matrix the plan was decided against
        # (pre- or post-merge fingerprint; legacy manifests without
        # fingerprints resume unconditionally — see
        # _merge_manifest_resumable). A mismatch means out-of-band
        # interference rotated the matrix under the manifest; resuming
        # would reassign healthy cells against retired centroids and
        # overwrite the fresh companion with the retired matrix —
        # retire the plan and re-decide from the current table instead.
        if _merge_manifest_resumable(spark, table):
            # resume the recorded plan — NEVER re-decide from the
            # table: a crashed fold/renumber leaves row counts
            # mid-flight, and a fresh cold detection against them
            # would pick a different (wrong) plan for the same merge.
            # The ORIGINAL matrix comes from the manifest too, not the
            # companion: a crash inside _finalize_index_contract may
            # have already rotated the fingerprint (or the companion
            # itself), and the recorded plan indexes the pre-merge
            # matrix.
            resuming = True
            man = spark.table(man_t).first().asDict()
            centroids = [list(c) for c in json.loads(man["cents"])]
            cold = [int(x) for x in man["cold"].split(",") if x != ""]
            survivors = [
                int(x) for x in man["survivors"].split(",") if x != ""
            ]
            moves = [
                (int(h), int(m))
                for h, m in (
                    p.split(":") for p in man["moves"].split(",") if p != ""
                )
            ]
        else:
            _drop_merge_manifest(spark, table)
    if not resuming:
        centroids = [list(c) for c in ivf_load_centroids(spark, table)]
        sizes = {
            r["_cell"]: r["n"]
            for r in spark.table(table)
            .groupBy("_cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        total = sum(sizes.values())
        # a matrix cell with NO partition directory is maximally cold
        cold = sorted(
            c
            for c in range(len(centroids))
            if sizes.get(c, 0) < min_cell_fraction * total
        )
        if not cold:
            return centroids
        survivors = [c for c in range(len(centroids)) if c not in set(cold)]
        if not survivors:
            raise ValueError(
                f"min_cell_fraction={min_cell_fraction} would retire every "
                f"cell of {table}; a merge must leave a survivor"
            )
        moves = _merge_renumber_plan(cold, survivors)
        write_table(
            spark.createDataFrame(
                [
                    (
                        ",".join(str(c) for c in cold),
                        ",".join(str(s) for s in survivors),
                        ",".join(f"{h}:{m}" for h, m in moves),
                        json.dumps(centroids),
                        _centroid_fingerprint(centroids),
                        _centroid_fingerprint(
                            _merged_matrix(centroids, moves, survivors)
                        ),
                    )
                ],
                "cold string, survivors string, moves string, "
                "cents string, pre_fp string, post_fp string",
            ),
            man_t,
        )

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # the fold-done marker is the commit point of the clean path's
        # moved-row append: present → the append landed whole, skip the
        # fold; absent on a resume → the append may be partial, run the
        # anti-join repair rewrite instead
        if not spark.catalog.tableExists(_merge_fold_marker_table(table)):
            _merge_fold_cold_rows(
                spark, table, cold, survivors, centroids,
                impl, data_cols, id_col, vec_col,
                repair=resuming,
            )
            _mark_fold_done(spark, table)
        # drop the folded cold partitions — EXCEPT holes the renumber
        # already filled: a resume landing after the renumber's source
        # drops finds hole h repopulated with source m's rows (m gone
        # is the completion signal for that pair), and re-dropping it
        # would destroy the renumbered partition, not cold residue
        present = _cell_partition_ids(spark, table)
        filled = {h for h, m in moves if m not in present}
        _drop_cell_partitions(
            spark, table, sorted((set(cold) & present) - filled)
        )
        spark.catalog.refreshTable(table)
        _merge_renumber_holes(spark, table, moves, data_cols)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    new_centroids = _merged_matrix(centroids, moves, survivors)
    spark.catalog.refreshTable(table)
    _finalize_index_contract(
        spark,
        table,
        new_centroids,
        impl=impl,
        pq=meta.get("pq") == "true",
        n_id_buckets=n_id_buckets,
        id_col=id_col,
        vec_col=vec_col,
    )
    _drop_merge_manifest(spark, table)
    return new_centroids


def _pruned_index_scan(spark, table: str, probes: DataFrame, n_cells: int):
    """Index scan with a LITERAL ``_cell IN (...)`` static partition
    filter — short-circuited: once the probed-cell set exceeds half of
    ``n_cells`` the filter prunes (almost) nothing, so skip the driver
    round-trip and scan the whole index unfiltered. Correctness never
    depends on the filter — every caller joins the scan back to the
    (query, cell) probe pairs, which is what enforces semantics — so
    the filter is purely a directory-pruning optimization. The
    detection collect is itself bounded by ``limit(threshold + 1)``,
    never by \\|queries\\| × n_probe."""
    threshold = max(1, n_cells // 2)
    rows = probes.select("_cell").distinct().limit(threshold + 1).collect()
    if len(rows) > threshold:
        return spark.table(table)
    return spark.table(table).filter(
        F.col("_cell").isin([r["_cell"] for r in rows])
    )


def ivf_query_index(
    spark,
    table: str,
    queries: DataFrame,
    centroids: list[list[float]] | None = None,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "mllib",
) -> DataFrame:
    """Top-k against a persisted :func:`ivf_build_index` table.

    Probe cells are computed per query (one numpy matmul against the
    tiny centroid matrix per Arrow batch), then the index scan is
    filtered with a LITERAL ``_cell IN (...)`` — a static partition
    filter that prunes whole directories at file-listing time
    (asserted in ``tests/test_dedup_similarity.py``), which a
    broadcast-join-only formulation would reach just at runtime via
    dynamic partition pruning. The distinct probed-cell collect is
    bounded by ``n_cells // 2 + 1`` via a pushed-down LIMIT, and once
    the probe set exceeds half the cells the filter (which would prune
    almost nothing) is skipped entirely — the probe join alone carries
    the semantics (see :func:`_pruned_index_scan`).

    ``impl="grid"``: for indexes built with the deterministic trainer
    (quantized-unit centroids) the probe runs through
    :func:`grid_assign_cells` — same quantization, same tie-breaks —
    so the whole query is engine-replayable. Partition pruning is
    unchanged (layout only).

    ``centroids=None`` loads the matrix from the persisted
    ``{table}_centroids`` companion (:func:`ivf_load_centroids`) — the
    no-driver-state form, and the way probes resume after a
    maintenance retrain rotated the matrix. An explicitly passed
    matrix is still fingerprint-validated against the index.
    """
    if centroids is None:
        centroids = ivf_load_centroids(spark, table)
    _check_centroids(spark, table, centroids)
    C = np.asarray(centroids, dtype=np.float64)

    if impl == "grid":
        probes = (
            grid_assign_cells(
                queries, query_id_col, vec_col, centroids,
                n_probe=n_probe, keep_cols=[vec_col],
            )
            .select(
                F.col(query_id_col).alias("_qid"),
                F.col(vec_col).alias("_qvec"),
                l2_norm(F.col(vec_col)).alias("_qn"),
                F.col("cell").alias("_cell"),
            )
        )
    elif impl == "mllib":

        @pandas_udf("array<int>")
        def probe_cells(vecs: pd.Series) -> pd.Series:
            if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
                return pd.Series([], dtype=object)
            V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            d = (V**2).sum(1)[:, None] - 2 * V @ C.T + (C**2).sum(1)[None, :]
            nearest = np.argsort(d, axis=1)[:, :n_probe]
            return pd.Series([row.astype("int32").tolist() for row in nearest])

        probes = queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            l2_norm(F.col(vec_col)).alias("_qn"),
            F.explode(probe_cells(F.col(vec_col))).alias("_cell"),
        )
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    indexed = _pruned_index_scan(spark, table, probes, len(C))
    cand = (
        indexed.withColumn("_cn", l2_norm(F.col(vec_col)))
        .join(F.broadcast(probes), "_cell")
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.round(
                cosine_from_norms(F.col(vec_col), F.col("_qvec"), "_cn", "_qn"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    multiprobe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    plane_impl: str = "gaussian",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    ``n_tables`` independent hash tables, each with its own ``n_planes``
    random hyperplanes; a corpus vector lands in one bucket per table
    (posexplode → n_tables index rows per vector). A query probes, per
    table, its own bucket plus every bucket within ``multiprobe_bits``
    bit flips; exact cosine runs only inside the probed buckets, and
    duplicates across tables collapse before ranking. Recall for a pair
    with per-bit collision prob p is 1-(1-p^b)^L — the classic
    memory-for-recall trade: the index is n_tables× the corpus key set,
    but candidate work stays ∝ bucket size, never corpus². At 100 TB,
    raise n_planes to keep buckets bounded and tune n_tables to the
    recall target; the join key (table, bucket) is hash-partitioned so
    AQE handles residual bucket skew.

    Output schema matches :func:`brute_force_topk`; rank is within the
    probed candidate set, so recall < 1.0 by construction.

    ``plane_impl``: ``"gaussian"`` (default — numpy standard-normal
    hyperplanes) or ``"md5"`` (±1 Rademacher planes regenerated from
    md5 parity via ``functions.vectors.sign_matrix`` — Charikar's SRP
    is valid for any symmetric plane distribution, and the md5 family
    is recomputable by any ANSI engine, so md5-family LSH is
    DuckDB-oracle replayable bucket for bucket; round 14, the same
    pattern as the CMS/simhash hash families. ±1 planes also make
    every per-plane product EXACT in doubles — float32 × ±1 — so the
    sign of each dot is engine-stable away from exact zero).
    """
    if plane_impl == "md5":
        from ..functions.vectors import sign_matrix

        all_planes = sign_matrix(dim, n_tables * n_planes, seed)
    elif plane_impl == "gaussian":
        all_planes = _hyperplanes(dim, n_tables * n_planes, seed)
    else:
        raise ValueError(f"unknown plane_impl: {plane_impl!r}")

    # One numpy matmul per Arrow batch computes EVERY table's bucket at
    # once ((batch × dim) @ (dim × T·b) → sign bits → per-table packed
    # ints) — vs n_tables·n_planes interpreted higher-order dot products
    # per row for the pure-Catalyst form (~20× slower measured).
    P = np.asarray(all_planes, dtype=np.float64)  # (T*b, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)  # bit i = plane i

    @pandas_udf("array<bigint>")
    def sig_array_udf(vecs: pd.Series) -> pd.Series:
        ok = vecs.notna()
        if not ok.any():
            return pd.Series([None] * len(vecs))
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
        bits = (V @ P.T) > 0  # (n, T*b)
        packed = (bits.reshape(len(V), n_tables, n_planes) * weights).sum(axis=2)
        j = 0
        res = []
        for o in ok:
            res.append(packed[j].tolist() if o else None)
            j += 1 if o else 0
        return pd.Series(res)

    def sig_array(vec: Column) -> Column:
        return sig_array_udf(vec)

    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("_cn"),
        F.posexplode(sig_array(F.col(vec_col))).alias("_tbl", "_bucket"),
    )
    probe_offsets = [0]
    if multiprobe_bits >= 1:
        probe_offsets += [1 << i for i in range(n_planes)]
    if multiprobe_bits >= 2:
        probe_offsets += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    q_sig = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
        F.posexplode(sig_array(F.col(vec_col))).alias("_tbl", "_qbucket"),
    )
    probes = q_sig.select(
        "_qid",
        "_qvec",
        "_qn",
        "_tbl",
        F.explode(
            F.array(*[F.col("_qbucket").bitwiseXOR(F.lit(o)) for o in probe_offsets])
        ).alias("_bucket"),
    ).dropDuplicates(["_qid", "_tbl", "_bucket"])

    cand = (
        c.join(F.broadcast(probes), ["_tbl", "_bucket"])
        .select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            F.round(
                cosine_from_norms(F.col(vec_col), F.col("_qvec"), "_cn", "_qn"), 6
            ).alias("cos_sim"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------------------- product
# quantization (Jégou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — method only, no code). The memory side
# of the ANN story: IVF prunes WHICH vectors are scored, PQ shrinks WHAT
# is stored/scored — a 64-dim float corpus compresses 256/m-fold
# (m=8 → one byte per 8 dims), which at 100 TB of embeddings is the
# difference between codes fitting executor memory and not.


class PQCodebook:
    """Trained product quantizer: ``m`` subspace codebooks of
    ``n_codes`` centroids each (numpy array shaped (m, n_codes,
    dim/m)), plus the geometry needed to encode/score."""

    def __init__(self, codebooks: "np.ndarray", dim: int, seed: int):
        self.codebooks = codebooks
        self.m, self.n_codes, self.sub = codebooks.shape
        self.dim = dim
        self.seed = seed


def _kmeans_lloyd(X: "np.ndarray", k: int, seed: int, iters: int) -> "np.ndarray":
    """Seeded Lloyd k-means on a driver-side sample (numpy). Bounded by
    construction (the sample is bounded); deterministic for a given
    seed. Empty clusters re-seed from the farthest points so all k
    codes stay live."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        assign = d.argmin(1)
        newC = C.copy()
        for j in range(k):
            members = X[assign == j]
            if len(members):
                newC[j] = members.mean(0)
            else:
                newC[j] = X[d.min(1).argmax()]
        if np.allclose(newC, C):
            break
        C = newC
    return C


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    fit_fraction: float | None = None,
    fit_target_rows: int = 100_000,
    seed: int = 42,
    iters: int = 20,
) -> PQCodebook:
    """Fit the product quantizer: split the vector into ``m`` equal
    subspaces and k-means each on a bounded sample (same
    ``_bounded_fit`` policy as the IVF coarse quantizer — the fit is a
    bounded job at any corpus size; codebooks total m × n_codes ×
    dim/m floats, kilobytes)."""
    sample = _bounded_fit(
        corpus.select(F.col(vec_col).alias("_v")).filter(
            F.col("_v").isNotNull()
        ),
        fit_fraction,
        seed,
        fit_target_rows,
    ).collect()
    X = np.stack([np.asarray(r._v, dtype=np.float64) for r in sample])
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    books = np.stack(
        [
            _kmeans_lloyd(X[:, j * sub : (j + 1) * sub], n_codes, seed + j, iters)
            for j in range(m)
        ]
    )
    return PQCodebook(books, dim, seed)


def _pq_codebook_table(table: str) -> str:
    return f"{table}_pq_codebook"


def pq_save_codebook(spark, table: str, codebook: PQCodebook) -> None:
    """Persist an index's product-quantizer codebook as the
    ``{table}_pq_codebook`` companion (m × n_codes rows of
    array<double> sub-centroids — kilobytes), the PQ twin of the
    ``{table}_centroids`` companion: maintenance retrains and
    other-session appends resolve it instead of requiring the caller
    to hold the trained object. Doubles round-trip parquet exactly, so
    the loaded codebook encodes bit-identically to the saved one.
    :func:`ivf_build_index` calls this whenever it writes PQ codes."""
    from ..sources.io import set_table_meta, write_table

    rows = [
        (j, c, [float(x) for x in codebook.codebooks[j, c]])
        for j in range(codebook.m)
        for c in range(codebook.n_codes)
    ]
    write_table(
        spark.createDataFrame(
            rows, "subspace int, code int, centroid array<double>"
        ),
        _pq_codebook_table(table),
    )
    set_table_meta(
        spark,
        _pq_codebook_table(table),
        kind="pq_codebook",
        m=codebook.m,
        n_codes=codebook.n_codes,
        dim=codebook.dim,
        seed=codebook.seed,
    )


def pq_load_codebook(spark, table: str) -> PQCodebook:
    """Rehydrate the :func:`pq_save_codebook` companion of ``table``.
    Raises if the companion is missing (an index built before the
    companion existed) or not a dense (m × n_codes) grid."""
    companion = _pq_codebook_table(table)
    from ..sources.io import get_table_meta

    meta = get_table_meta(spark, companion)
    m, n_codes = int(meta["m"]), int(meta["n_codes"])
    rows = spark.table(companion).orderBy("subspace", "code").collect()
    if len(rows) != m * n_codes or [
        (r["subspace"], r["code"]) for r in rows
    ] != [(j, c) for j in range(m) for c in range(n_codes)]:
        raise ValueError(f"{companion} is not a dense (m x n_codes) grid")
    books = np.asarray(
        [r["centroid"] for r in rows], dtype=np.float64
    ).reshape(m, n_codes, -1)
    return PQCodebook(books, int(meta["dim"]), int(meta["seed"]))


def pq_encode(
    corpus: DataFrame,
    codebook: PQCodebook,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append ``code_col``: array<smallint> of length m — per subspace,
    the index of the nearest codebook centroid. One Arrow kernel pass
    (narrow map, no shuffle); the encoded column is what a 100 TB
    deployment PERSISTS (dim/m × compression vs the float vector), the
    raw vector column can be dropped or left cold."""
    books = codebook.codebooks  # (m, k, sub)
    sub = codebook.sub
    m = codebook.m

    @pandas_udf("array<smallint>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(V), m), dtype=np.int16)
        for j in range(m):
            S = V[:, j * sub : (j + 1) * sub]
            B = books[j]
            d = (S**2).sum(1)[:, None] - 2 * S @ B.T + (B**2).sum(1)[None, :]
            out[:, j] = d.argmin(1).astype(np.int16)
        return pd.Series([row.tolist() for row in out])

    return corpus.withColumn(code_col, encode(F.col(vec_col)))


def _adc_scored(
    encoded: DataFrame,
    queries: DataFrame,
    codebook: PQCodebook,
    id_col: str,
    code_col: str,
    vec_col: str,
    query_id_col: str,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(query_id, id, adc_dist [, passthrough…]) for every (query,
    encoded row) pair: per query, the m × n_codes table of partial
    squared distances query-subvector ↔ codebook centroid is built
    driver-side (|Q| × m × n_codes doubles, broadcast with the kernel
    closure — query sets are broadcast-small by the same contract as
    :func:`brute_force_topk`); each corpus CODE then scores as m table
    lookups in one Arrow pass. No float vectors are read on the corpus
    side."""
    books = codebook.codebooks
    sub = codebook.sub
    m = codebook.m
    extra = list(passthrough or [])
    q_rows = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    ).collect()
    qids = [r._qid for r in q_rows]
    Q = np.stack([np.asarray(r._qv, dtype=np.float64) for r in q_rows])
    # (n_queries, m, n_codes) partial squared distances
    tables = np.stack(
        [
            np.stack(
                [
                    ((Q[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2).sum(2)[qi]
                    for j in range(m)
                ]
            )
            for qi in range(len(qids))
        ]
    )

    @pandas_udf("array<double>")
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        C = np.stack([np.asarray(c, dtype=np.int64) for c in codes])  # (b, m)
        cols = np.arange(m)
        # for each query: sum over subspaces of table[j, code_j]
        dists = np.stack(
            [tables[qi][cols, C].sum(1) for qi in range(len(qids))], axis=1
        )  # (b, n_queries)
        return pd.Series([row.tolist() for row in dists])

    return (
        encoded.select(F.col(id_col), *extra, adc(F.col(code_col)).alias("_d"))
        .select(
            id_col,
            *extra,
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(q) for q in qids]).alias("qid"),
                    F.col("_d").alias("dist"),
                )
            ).alias("_z"),
        )
        .select(
            F.col("_z.qid").alias(query_id_col),
            F.col(id_col),
            *extra,
            F.round(F.col("_z.dist"), 6).alias("adc_dist"),
        )
    )


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebook: PQCodebook,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    the whole encoded corpus. Returns (query_id, vec_id, adc_dist,
    rank), ascending distance (L2; ties break on id). Approximate by
    construction (quantization distortion) — pair with the exact tier
    when recall must be 1; see :func:`_adc_scored` for the cost model
    and :func:`ivf_pq_index_topk` for the cell-pruned composition."""
    scored = _adc_scored(
        encoded, queries, codebook, id_col, code_col, vec_col, query_id_col
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_pq_index_topk(
    spark,
    table: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: PQCodebook,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF × PQ — the full ANN composition over a persisted
    :func:`ivf_build_index` table: coarse cells prune WHICH vectors are
    touched (literal ``_cell IN (...)`` partition filter, directories
    skipped at file-listing time), PQ shrinks WHAT is scored (codes via
    :func:`pq_encode` — encode once and persist the ``code_col``
    alongside the index in a real deployment; this function encodes the
    pruned scan on the fly when the column is absent). Each query ranks
    only candidates from ITS probed cells (semi-join on the bounded
    (query, cell) probe pairs). Returns (query_id, vec_id, adc_dist,
    rank), ascending ADC distance."""
    _check_centroids(spark, table, centroids)
    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = (V**2).sum(1)[:, None] - 2 * V @ C.T + (C**2).sum(1)[None, :]
        nearest = np.argsort(d, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in nearest])

    probes = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.explode(probe_cells(F.col(vec_col))).alias("_cell"),
    )
    pruned = _pruned_index_scan(spark, table, probes, len(C))
    if code_col not in pruned.columns:
        pruned = pq_encode(pruned, codebook, vec_col=vec_col, code_col=code_col)
    scored = _adc_scored(
        pruned, queries, codebook, id_col, code_col, vec_col, query_id_col,
        passthrough=["_cell"],
    )
    cand = scored.join(
        F.broadcast(probes),
        (F.col(query_id_col) == F.col("_qid")) & (scored["_cell"] == probes["_cell"]),
        "leftsemi",
    ).drop("_cell")
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    candidates: DataFrame | None = None,
    exclude_top: int = 0,
    max_sim: float | None = None,
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training data
    (the DPR / Sentence-BERT recipe): per query, the top-``k``
    most-similar corpus items that are NOT known positives — the
    negatives a contrastive loss learns most from. Returns
    ``(query_id, vec_id, cos_sim, neg_rank)``.

    ``positives`` is the labeled (query_id, id) relevance set,
    anti-joined out. Two false-negative guards, both standard
    practice: ``exclude_top`` skips the N most-similar survivors per
    query (the "semi-hard" trick — unlabeled true positives
    concentrate at the very top), and ``max_sim`` drops candidates
    above a similarity ceiling (a near-duplicate of the positive is
    almost surely relevant, not a negative).

    ``candidates`` switches the retrieval tier: pass any
    (query_id, id, cos_sim) frame — ``ivf_query_index`` output for
    corpus scale, ``lsh_topk`` — or None for the exact default, which
    scores the full corpus per query (the brute-force scoring pass
    WITHOUT a pre-cut: a top-k budget cannot know how many rows the
    exclusions will drop, so cutting early would under-fill the
    negative pool). With an ANN candidate frame, over-retrieve by the
    expected exclusion count — the trade every ANN consumer makes.
    All downstream filtering is pure Catalyst — one anti-join + one
    per-query window, candidate-sized."""
    if candidates is None:
        # exact default: score the WHOLE corpus per query (the same
        # work brute_force_topk does before its rank cut) and let the
        # exclusions below pick from the full pool — a pre-cut top-k
        # budget cannot know how many rows ``max_sim`` will drop, and
        # under-filling the negative pool silently starves exactly the
        # queries with near-duplicate heads that the ceiling targets
        q = F.broadcast(
            queries.select(
                F.col(query_id_col).alias("_qid"),
                F.col(vec_col).alias("_qvec"),
                l2_norm(F.col(vec_col)).alias("_qn"),
            )
        )
        candidates = (
            corpus.withColumn("_cn", l2_norm(F.col(vec_col)))
            .crossJoin(q)
            .select(
                F.col("_qid").alias(query_id_col),
                F.col(id_col),
                F.round(
                    cosine_from_norms(
                        F.col(vec_col), F.col("_qvec"), "_cn", "_qn"
                    ),
                    6,
                ).alias("cos_sim"),
            )
        )
    neg = candidates.join(
        positives.select(query_id_col, id_col), [query_id_col, id_col], "left_anti"
    )
    if max_sim is not None:
        neg = neg.filter(F.col("cos_sim") <= max_sim)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        neg.withColumn("_r", F.row_number().over(w))
        .filter((F.col("_r") > exclude_top) & (F.col("_r") <= exclude_top + k))
        .select(
            query_id_col,
            id_col,
            "cos_sim",
            (F.col("_r") - exclude_top).alias("neg_rank"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    score_col: str = "cos_sim",
    sim_round: int | None = 6,
) -> DataFrame:
    """Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998)
    of per-query candidate sets: greedily pick the candidate maximizing
    ``lam · relevance − (1 − lam) · max cosine to already-picked``, so
    the final k trade relevance against diversity instead of returning
    near-duplicate neighbors. ``lam=1.0`` degenerates to plain
    relevance order (pinned against :func:`brute_force_topk` by test).

    ``candidates`` is the OUTPUT of a cheap top-N retrieval (brute
    force, IVF, LSH — any of this module's tiers, with N a few × k)
    joined with its candidate vectors: one row per (query, candidate)
    carrying ``id_col, vec_col, score_col``. NULL/empty vectors are
    dropped up front (they cannot contribute a similarity).

    Returns ``(query_id, id, score, mmr_rank)`` with ``mmr_rank``
    1-based in selection order. Deterministic: equal MMR scores break
    toward the candidate earlier in (relevance desc, id asc) order,
    and pairwise similarities are rounded to ``sim_round`` decimals
    BEFORE the greedy comparison (round 14) — the same
    round-before-rank rule as :func:`mine_hard_negatives`, which makes
    the whole greedy selection replayable by a SQL engine computing
    cosines independently (6 dp ties on raw doubles would otherwise
    break on engine-specific last-ulp noise). ``sim_round=None``
    restores raw-double comparisons.

    The redundancy penalty FLOORS AT ZERO: ``max_sim`` accumulates
    from 0, so a candidate anti-similar to everything picked pays no
    penalty but earns no diversity BONUS either (raw MMR would let a
    negative max cosine inflate the score above pure relevance). The
    DuckDB oracle replays this as ``greatest(0, max(sim))``.

    Scale: greedy selection is inherently sequential PER QUERY but
    queries are independent — ``applyInPandas`` groups by query id, so
    the work distributes across queries; each group is candidate-sized
    (N ≤ a few hundred rows — the caller's retrieval already cut the
    corpus), one O(N²·dim) numpy pass per group, never corpus-sized.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    # output field types come from the candidate frame's actual schema —
    # string doc ids / float scores must round-trip untouched, not be
    # miscast through a hardcoded long/double
    from pyspark.sql.types import IntegerType, StructField, StructType

    in_fields = {f.name: f for f in candidates.schema.fields}
    out_schema = StructType(
        [
            in_fields[query_id_col],
            in_fields[id_col],
            in_fields[score_col],
            StructField("mmr_rank", IntegerType()),
        ]
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[vec_col].notna()]
        if len(pdf) == 0:
            return pd.DataFrame(
                {query_id_col: [], id_col: [], score_col: [], "mmr_rank": []}
            )
        # stable candidate order: relevance desc, id asc (the tiebreak)
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        V = V / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: list[int] = []
        cand = np.ones(n, dtype=bool)
        max_sim = np.zeros(n, dtype=np.float64)
        while cand.any() and len(picked) < k:
            if picked:
                score = lam * rel - (1.0 - lam) * max_sim
            else:
                score = rel.copy()
            score[~cand] = -np.inf
            # argmax with lowest-index (= lowest-id after the sort) ties
            best = int(np.argmax(score))
            picked.append(best)
            cand[best] = False
            sims = V @ V[best]
            if sim_round is not None:
                sims = np.round(sims, sim_round)
            max_sim = np.maximum(max_sim, sims)
        sel = pdf.iloc[picked]
        return pd.DataFrame(
            {
                query_id_col: sel[query_id_col].to_numpy(),
                id_col: sel[id_col].to_numpy(),
                score_col: sel[score_col].to_numpy(),
                "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return candidates.groupBy(query_id_col).applyInPandas(_mmr, out_schema)


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "exact",
    out_col: str = "predicted_label",
    **impl_kwargs,
):
    """k-nearest-neighbor classification over an embedding corpus:
    each query takes the majority label among its k nearest neighbors
    by cosine — the label-propagation step pipelines use to spread
    curated quality/domain/topic tags from a labeled seed set to the
    whole corpus. Vote ties break deterministically: higher count,
    then (min neighbor rank among the tied labels) — i.e. the tied
    label with the closest supporting neighbor wins, matching the
    intuition that nearer evidence is stronger.

    ``impl="exact"`` retrieves via :func:`brute_force_topk` (the
    oracle-replayable baseline — ranking and voting are plain SQL);
    ``impl="ivf"`` via :func:`ivf_topk` (the sublinear scale path:
    same voting over approximate neighbors; ``impl_kwargs`` forwarded,
    e.g. n_clusters/n_probe).

    Returns one row per query: ``(query_id, out_col, n_votes)``.
    Scale: retrieval dominates (see the chosen tier); voting is k
    rows per query — a per-query groupBy on an already-tiny frame.
    """
    if impl == "exact":
        cand = brute_force_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col,
        )
    elif impl == "ivf":
        cand = ivf_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, **impl_kwargs,
        )
    else:
        raise ValueError(f"unknown knn impl: {impl!r} (exact|ivf)")
    labeled = cand.join(
        corpus.select(F.col(id_col), F.col(label_col)), id_col
    )
    votes = labeled.groupBy(query_id_col, label_col).agg(
        F.count(F.lit(1)).alias("n_votes"),
        F.min("rank").alias("_best_rank"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("n_votes"), F.asc("_best_rank"), F.asc(label_col)
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            query_id_col,
            F.col(label_col).alias(out_col),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
    )
