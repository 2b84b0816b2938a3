"""Structured Streaming flavor of the materialization pipeline.

The reference is micro-batch only: cron ticks re-materialize recent
insert-time buckets (maintenance.rs:140-212,349-399; SURVEY §2.9 — no
continuous operators, no watermark row-dropping). The Spark-idiomatic
mirror is Structured Streaming over the landing zone with
``foreachBatch`` appending *partial* (composable) aggregates, exactly-once
via checkpoints; readers re-aggregate (merge query semantics, SURVEY §2.4
A2). ``trigger(availableNow=True)`` gives the reference's catch-up tick;
``processingTime`` triggers give its cadences.

``stream_log_stats`` additionally shows the native watermark+window shape
for pipelines that do want event-time finality — with the caveat the
reference semantics (late data always lands, buckets re-materialize)
are the foreachBatch path, not the watermark path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_log_stats(
    events: DataFrame, bin_seconds: int = 60, watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window pre-aggregation of a streaming event table
    (log_stats_view.rs:32-45 as a continuous query). ``events`` must carry
    an ``event_time`` TimestampType column."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", f"{bin_seconds} seconds").alias("time_bin"),
            "level",
            "target",
        )
        .agg(F.count("*").alias("count"))
    )


def materialize_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    bin_seconds: int = 60,
) -> StreamingQuery:
    """Incrementally materialize partial log_stats aggregates from a parquet
    landing zone (the raw block store analogue). Each micro-batch appends
    its own pre-aggregated rows — composable, so the reader merges with
    SUM(count). Checkpointing makes re-runs process only new files
    (exactly-once), which is precisely the reference's freshness contract
    done by Spark instead of hand-rolled source hashes."""
    stride = bin_seconds * 1_000_000_000

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy(
            (F.col("time_ns") - F.col("time_ns") % stride).alias("time_bin_ns"),
            "process_id",
            "level",
            "target",
        ).agg(F.count("*").alias("count"))
        agg.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    events: DataFrame, id_cols: list[str], watermark_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact deduplication: drop re-deliveries of the same key
    within the watermark horizon (dropDuplicatesWithinWatermark — state
    stays bounded by the watermark, unlike dropDuplicates which keeps keys
    forever). The streaming counterpart of operators/dedup.dedup_exact for
    at-least-once ingestion paths (the reference's ingestion can re-send
    blocks; its freshness hashes make re-materialization idempotent — this
    is the same guarantee applied at row level in-stream)."""
    return events.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def read_log_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read: SUM(count) re-aggregation over the appended partials
    (the merge query of LOG_STATS)."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("time_bin_ns", "process_id", "level", "target")
        .agg(F.sum("count").alias("count"))
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    time_col: str = "event_time",
    key_col: str = "user_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Native session windows over a stream: Spark's ``session_window``
    merges events of a key whose gaps stay under ``gap`` (the streaming
    counterpart of the batch lag/running-sum sessionization in
    queries/sql_surface.events_sessionize — the reference has no session
    windows at all, SURVEY §2.9). State per key is one open session that
    closes — and emits, in append mode — once the watermark passes its
    end; session count is bounded by active keys, not event volume."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("total_value")
        )
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("sess"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            *(["n_events"] + (["total_value"] if value_col is not None else [])),
        )
    )


def stream_sliding_rates(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    time_col: str = "event_time",
    key_col: str = "level",
) -> DataFrame:
    """Sliding-window rates over a stream — the remaining window shape of
    SURVEY §2.9 (tumbling = stream_log_stats, session =
    stream_sessionize; the reference has neither sliding nor session,
    this is Spark-extra surface): each event lands in window/slide
    overlapping windows, so per-window counts give a smoothed rate
    without a separate smoothing pass. State is bounded by
    (keys × windows inside the watermark horizon); windows emit on
    watermark passage in append mode."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window, slide).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
        )
    )


def _signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """One row per doc (id, sh, mhs): the int-hashed shingle set plus the
    MinHash signature array. Same definitions as
    operators/dedup.minhash_lsh_candidates (shared code), so streaming and
    batch discovery agree exactly. The signature array is what the store
    persists — band keys are derived from it on demand (cheap array ops,
    no md5 recompute), so one stored relation serves both the candidate
    join and the verify join."""
    from micromegas_spark.operators.dedup import _minhash_sig_sql, _shingle_sets

    sh = _shingle_sets(df, text_col, id_col, shingle_n)
    return sh.select(
        F.col(id_col),
        "sh",
        # one-round-trip SQL spelling of the fold (see _minhash_sig_sql)
        F.expr(f"explode(array({_minhash_sig_sql('sh', n_hashes)}))").alias("mhs"),
    )


def _band_keys(sig: DataFrame, id_col: str, n_hashes: int, bands: int) -> DataFrame:
    """(id, band, bkey) from an (id, mhs) relation — the LSH banding of a
    stored signature array (same composite-key definition as the batch
    operator)."""
    rows = n_hashes // bands
    # single SQL string per build (py4j round-trip economy, same as the
    # batch _banded_keys)
    band_structs = ", ".join(
        "named_struct('band', {b}, 'bkey', concat_ws(':', {els}))".format(
            b=b,
            els=", ".join(
                f"element_at(mhs, {b * rows + r + 1})" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return sig.select(
        F.col(id_col), F.expr(f"explode(array({band_structs}))").alias("bb")
    ).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )


def stream_minhash_neardup(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_files_per_trigger: int | None = None,
    store_files: int | None = None,
    band_store_table: str | None = None,
    band_store_buckets: int = 32,
) -> StreamingQuery:
    """Incremental MinHash near-duplicate detection over a document
    landing zone — the streaming counterpart of
    operators/dedup.minhash_near_duplicates and the shape a production
    ingest pipeline actually needs: each arriving micro-batch is checked
    against EVERYTHING ingested so far without recomputing old signatures.

    Per micro-batch (foreachBatch, exactly-once via checkpoint):

    1. compute the batch's shingle sets + banded signatures (shared code
       with the batch operator);
    2. LSH-join batch band keys against the accumulated store's band keys
       (old signatures are never recomputed) AND against the batch itself;
    3. verify candidates with exact Jaccard ≥ threshold, append surviving
       (id_a, id_b, jaccard) rows to ``pairs_dir``;
    4. append the batch's signatures/band keys to ``store_dir``.

    Each true pair is discovered exactly once — in the batch where its
    later member arrives — so ``pairs_dir`` needs no dedup-on-read.

    Scale shape: the store is ONE signature relation (id, sh, mhs) — band
    keys are derived from the stored signature array on read (array ops,
    no md5 recompute), so each tick costs one persist and two appends
    (pairs + store). The candidate join shuffles on the band key (prunable
    to changed bands with a bucketed store layout); state lives in the
    object store, not executor memory, so the horizon is unbounded — the
    property watermark-based streaming dedup cannot give (dropDuplicates
    state grows per key; here Spark holds no state at all between
    batches). ``store_files`` compacts each tick's appends to that many
    files (small-file hygiene; size it to the batch volume — None keeps
    the batch's natural partitioning).

    ``band_store_table``: name of a managed table holding the exploded
    band keys (band, bkey, id) BUCKETED by (band, bkey)
    (sources/bucketing.py shape). With it set, the store side of the
    per-tick candidate join is a bucketed scan already hash-partitioned
    on the join key — NO full-store Exchange per tick (only the small
    batch side shuffles; plan-asserted in
    tests/test_review_regressions.py), and band keys are never
    re-derived from stored signatures. That is the layout that keeps
    tick cost proportional to batch size when the store holds 10⁹
    signatures. Without it the store rides in ``store_dir`` parquet and
    band keys are derived on read (fine for moderate stores; the
    shuffle grows with store size)."""
    import os

    from micromegas_spark.operators.dedup import jaccard

    sig_dir = os.path.join(store_dir, "sigs")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # availableNow honors read limits (Spark 3.3+): one query run
        # splits the backlog into per-file micro-batches — the multi-tick
        # ingest shape without paying a streaming-query startup per tick
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _read_store(sig_dir: str) -> DataFrame:
        """Signature store read with a migration shim: a store written by
        the pre-(id, sh, mhs) layout carries only (id, sh) — derive the
        signature array from the stored shingle sets on read (one extra
        fold per old row; new appends carry mhs and skip it)."""
        from micromegas_spark.operators.dedup import minhash_signature_from_hashes

        st = spark.read.parquet(sig_dir)
        derived = minhash_signature_from_hashes("sh", n_hashes)
        if "mhs" not in st.columns:
            st = st.withColumn("mhs", derived)
        else:
            # a mixed store (old files appended to before the upgrade,
            # new files after) surfaces the missing column as NULLs
            st = st.withColumn("mhs", F.coalesce(F.col("mhs"), derived))
        return st

    def tick(batch_df: DataFrame, batch_id: int) -> None:
        # compaction happens at WRITE time only — the persisted relation
        # keeps its natural partitioning so the candidate/verify joins
        # read the cache in parallel
        sig = _signatures(batch_df, text_col, id_col, n_hashes, shingle_n).persist()
        try:
            band_keys = _band_keys(sig, id_col, n_hashes, bands)
            new_b = band_keys.select(
                F.col(id_col).alias("_nid"), "band", "bkey"
            )
            # batch × store candidates (new doc vs any older doc)
            cands = None
            old_b = None
            if (
                band_store_table is not None
                and not spark.catalog.tableExists(band_store_table)
                and os.path.isdir(sig_dir)
            ):
                # one-time backfill: a pre-existing (non-bucketed) sig
                # store must seed the band table before it becomes the
                # authoritative join side, or docs ingested before the
                # upgrade would silently drop out of candidate generation
                (
                    _band_keys(
                        _read_store(sig_dir).select(id_col, "mhs"),
                        id_col,
                        n_hashes,
                        bands,
                    )
                    .select("band", "bkey", id_col)
                    .write.mode("append")
                    .bucketBy(band_store_buckets, "band", "bkey")
                    .format("parquet")
                    .saveAsTable(band_store_table)
                )
                spark.catalog.refreshTable(band_store_table)
            if band_store_table is not None and spark.catalog.tableExists(
                band_store_table
            ):
                # bucketed band-key store: the scan is already hash-
                # partitioned on (band, bkey) — no store-side Exchange
                old_b = spark.table(band_store_table).select(
                    F.col(id_col).alias("_oid"), "band", "bkey"
                )
            elif os.path.isdir(sig_dir):
                old_b = _band_keys(
                    _read_store(sig_dir).select(id_col, "mhs"),
                    id_col,
                    n_hashes,
                    bands,
                ).select(F.col(id_col).alias("_oid"), "band", "bkey")
            if old_b is not None:
                cands = (
                    new_b.join(old_b, ["band", "bkey"])
                    .select(
                        F.least("_nid", "_oid").alias("id_a"),
                        F.greatest("_nid", "_oid").alias("id_b"),
                    )
                    .where(F.col("id_a") != F.col("id_b"))
                )
            # batch × batch candidates
            other = band_keys.select(
                F.col(id_col).alias("_mid"), "band", "bkey"
            )
            intra = (
                new_b.join(other, ["band", "bkey"])
                .where(F.col("_nid") < F.col("_mid"))
                .select(F.col("_nid").alias("id_a"), F.col("_mid").alias("id_b"))
            )
            cands = intra if cands is None else cands.unionByName(intra)
            cands = cands.distinct()

            all_sigs = sig.select(id_col, "sh")
            # pin the store side of the verify join to the files present
            # BEFORE this tick's appends: the sig write below may run
            # concurrently with the verify job (see the write overlap), and
            # a directory read racing that append could double-count the
            # batch's own signatures
            if os.path.isdir(sig_dir):
                prior_sig_files = sorted(
                    os.path.join(sig_dir, e)
                    for e in os.listdir(sig_dir)
                    if e.endswith(".parquet") and not e.startswith(("_", "."))
                )
                if prior_sig_files:
                    all_sigs = all_sigs.unionByName(
                        spark.read.parquet(*prior_sig_files).select(id_col, "sh")
                    )
            a = all_sigs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("_sha"))
            b = all_sigs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("_shb"))
            verified = (
                cands.join(a, "id_a")
                .join(b, "id_b")
                .select(
                    "id_a",
                    "id_b",
                    F.round(jaccard(F.col("_sha"), F.col("_shb")), 6).alias("jaccard"),
                )
                .where(F.col("jaccard") >= threshold)
            )
            if store_files is not None:
                verified = verified.repartition(store_files)

            def _write_pairs() -> None:
                verified.write.mode("append").parquet(pairs_dir)

            def _write_sigs() -> None:
                out_sig = (
                    sig.repartition(store_files) if store_files is not None else sig
                )
                out_sig.write.mode("append").parquet(sig_dir)

            def _write_bands() -> None:
                # pre-shuffle to the bucket spec: repartition(N, cols) and
                # bucketBy(N, cols) hash identically (pmod(murmur3, N)), so
                # each write task holds exactly ONE bucket and the append
                # lands N files per tick instead of tasks x buckets — the
                # store's file count (and every later tick's bucketed-scan
                # listing) stays proportional to tick count, not task count
                (
                    band_keys.select("band", "bkey", id_col)
                    .repartition(band_store_buckets, "band", "bkey")
                    .write.mode("append")
                    .bucketBy(band_store_buckets, "band", "bkey")
                    .format("parquet")
                    .saveAsTable(band_store_table)
                )
                # the session caches the table's file listing; without a
                # refresh the NEXT tick (and the caller) would read a
                # stale snapshot missing this append
                spark.catalog.refreshTable(band_store_table)

            if band_store_table is not None:
                # the three tick outputs are mutually independent jobs:
                # pairs reads the sig cache + the PINNED prior-file store
                # snapshot, sigs reads only the cache, bands reads only the
                # cache. Running them sequentially leaves the cluster idle
                # in each job's scheduling/commit tail (guide §2.6). The
                # verify job racing the band append is benign by
                # construction: any own-batch pair surfaced via freshly
                # appended band rows is already produced by the intra-batch
                # path and collapsed by cands.distinct(), and appends never
                # remove files, so a concurrent listing sees a subset —
                # results are byte-identical to the sequential order.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=3) as pool:
                    futs = [
                        pool.submit(f)
                        for f in (_write_pairs, _write_sigs, _write_bands)
                    ]
                    for fu in futs:
                        fu.result()
            else:
                # plain-store path: the candidate side derives band keys
                # from sig_dir itself (not pinned), so the sig append must
                # stay AFTER the verify job
                _write_pairs()
                _write_sigs()
        finally:
            sig.unpersist()

    return (
        stream.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_scratch_dir(name: str) -> str:
    """A per-``name``, per-PROCESS scratch directory under the temp root,
    FRESH on every call: prior runs of THIS process are wiped, and dirs
    left by DEAD processes are reaped (a LIVE pid's dir belongs to a
    concurrent session — parallel pytest workers, two engines on one box —
    and must survive). The pid suffix prevents cross-session races; the
    reaper prevents the other failure mode, unbounded temp-dir
    accumulation across crashed runs. Shared by one_shot_stream_table and
    the streaming-ingest registry queries."""
    import shutil
    import tempfile

    tmp = tempfile.gettempdir()
    prefix = f"{name}_"
    for entry in os.listdir(tmp):
        if not entry.startswith(prefix):
            continue
        try:
            pid = int(entry[len(prefix):])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # raises if the process is gone
        except ProcessLookupError:
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid: leave it
    mine = os.path.join(tmp, f"{prefix}{os.getpid()}")
    shutil.rmtree(mine, ignore_errors=True)
    return mine


def one_shot_stream_table(
    spark: SparkSession,
    batches: "list[DataFrame]",
    schema,
    build,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Run a streaming transformation over a fixed sequence of
    micro-batches and return the complete-mode result table.

    Each batch DataFrame lands as one parquet file in a per-``name``,
    per-PROCESS directory (prior runs of THIS process are wiped; the pid
    suffix keeps two concurrent sessions — parallel pytest workers, two
    engines on one box — from deleting each other's in-flight landing
    dir mid-stream); ``maxFilesPerTrigger=1`` + ``availableNow`` makes
    one ordered micro-batch per file in a single query run. The memory
    sink view is dropped before reuse so the fixed table name never
    collides or accumulates. Used by the streaming≡batch equivalence
    queries."""
    land = process_scratch_dir(f"one_shot_stream_{name}")
    # FileStreamSource orders micro-batches by file MODIFICATION TIME;
    # sequential writes usually ascend but can tie at fs resolution, and
    # ORDER-SENSITIVE stateful transforms (the thread-span stack machine)
    # need batch i strictly before batch i+1 — pin each batch's files to
    # an explicit ascending mtime so listing order IS batch order
    import time as _time

    t0 = _time.time()
    # The batch builds are INDEPENDENT Spark jobs (each reads its own slice
    # of the source); running them sequentially leaves the cluster idle in
    # each job's scheduling/commit tail. Overlap them from a small thread
    # pool (guide §2.6 — actions are only sequential because driver code
    # calls them sequentially), each landing in its own staging dir, then
    # move the files into the landing dir in batch order with pinned
    # ascending mtimes — ordering is established entirely AFTER the
    # parallel phase, so it is exactly as deterministic as the old
    # sequential write+utime loop.
    # repartition(1), NOT coalesce(1): coalesce folds the WHOLE upstream
    # computation of the batch into the single write task (a kmv batch's
    # md5-shingle explode ran serially there — guide §2.5 input skew,
    # self-inflicted); repartition keeps the compute at full parallelism
    # and only the final exchange lands on one writer.
    import shutil as _shutil
    from concurrent.futures import ThreadPoolExecutor

    def _build(i: int) -> str:
        stage = f"{land}.stage{i}"
        batches[i].repartition(1).write.mode("overwrite").parquet(stage)
        return stage

    os.makedirs(land, exist_ok=True)
    with ThreadPoolExecutor(max_workers=min(4, max(1, len(batches)))) as pool:
        stages = list(pool.map(_build, range(len(batches))))
    for i, stage in enumerate(stages):
        for entry in sorted(os.listdir(stage)):
            if not entry.endswith(".parquet") or entry.startswith(("_", ".")):
                continue
            dst = os.path.join(land, f"b{i:05d}-{entry}")
            _shutil.move(os.path.join(stage, entry), dst)
            os.utime(dst, (t0 + 10 * i, t0 + 10 * i))
        _shutil.rmtree(stage, ignore_errors=True)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(land)
    )
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    # Stateful streaming instantiates ONE state-store partition per
    # spark.sql.shuffle.partitions, each with per-micro-batch checkpoint
    # file I/O — the session's scale default (cpus*8, right for big batch
    # sorts) made every micro-batch pay ~256 tiny state commits (measured:
    # the *_stream oracle queries regressed 1.4-3x). Pin the streaming
    # query's partitioning BELOW the core count: each state partition's
    # micro-batch task is latency-bound (store open/replay/commit, ~0 CPU
    # measured — 2 s executor CPU against 226 task-seconds on stage 39 of
    # a sessionize run), so instances cost fixed time regardless of rows.
    # cores/4 with a floor of 8 (the floor keeps the low-core driver runs
    # at their previous value; the ratio scales the instance count with
    # the cluster). Interleaved min-of-3 at 32 cores: sessionize
    # 9.1 -> 5.8 s, counter-rate 7.2 -> 4.0, sliding 3.8 -> 2.4 at 8
    # partitions. The conf is read at start() and baked into the query's
    # checkpoint, then restored.
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, spark.sparkContext.defaultParallelism // 4)),
    )
    try:
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
