"""Physical-plan audits for representative registry queries: filters reach
the parquet scans (PushedFilters), projections prune the read schema
(ReadSchema), small dims broadcast, top-k avoids a global sort. These are
the properties that decide 100 TB behavior — a query can be value-correct
and still read every column of every row."""

from __future__ import annotations

import re

import pytest

from micromegas_spark.queries import REGISTRY
from tests.conftest import SF_CORRECT


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF_CORRECT)
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str, table: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "FileScan" in ln and table in ln]


def test_q10_filters_pushed_and_schema_pruned(spark):
    plan = _plan(spark, "q10_returned_items")
    (li,) = _scan_lines(plan, "lineitem")
    assert "l_returnflag" in li and "PushedFilters" in li
    # projection pruning: untouched lineitem columns never leave the scan
    m = re.search(r"ReadSchema: [^,]*struct<([^>]*)>", li)
    assert m and "l_tax" not in m.group(1) and "l_linenumber" not in m.group(1)
    (o,) = _scan_lines(plan, "orders.parquet")
    assert "o_orderdate" in o and "GreaterThanOrEqual" in o


def test_q1_shipdate_pushed(spark):
    plan = _plan(spark, "q1_pricing_summary")
    (li,) = _scan_lines(plan, "lineitem")
    assert "PushedFilters" in li and "l_shipdate" in li


def test_q19_common_disjuncts_pushed(spark):
    plan = _plan(spark, "q19_disjunctive_predicates")
    (p,) = _scan_lines(plan, "part.parquet")
    # Catalyst extracts p_brand IN (...) from the OR groups and pushes it
    assert "p_brand" in p, p
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dims(spark):
    plan = _plan(spark, "q5_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    (r,) = _scan_lines(plan, "region.parquet")
    assert "r_name" in r and "PushedFilters" in r


def test_q3_topk_no_global_sort(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    # the limit must ride the top-k operator, not a full Sort+CollectLimit
    assert "GlobalLimit" not in plan


def test_stratified_sample_is_scan_side_filter(spark):
    plan = _plan(spark, "docs_stratified_sample")
    # the sampling decision is a map-side filter against the scan: the only
    # Exchange in the plan is the final orderBy's range partitioning
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1 and "rangepartitioning" in exchanges[0], plan
    # and the hash predicate reaches the scan itself (DataFilters carries
    # the md5 expression on the FileScan node)
    (scan,) = _scan_lines(plan, "documents.parquet")
    assert "md5" in scan, scan


def test_events_scan_prunes_props(spark):
    # queries not touching the wide props column must not read it
    plan = _plan(spark, "events_hourly_errors")
    (ev,) = _scan_lines(plan, "events.parquet")
    m = re.search(r"ReadSchema: [^,]*struct<([^>]*)>", ev)
    assert m and "props" not in m.group(1)


def test_contamination_broadcasts_benchmark_side(spark):
    plan = _plan(spark, "docs_contamination")
    # the exploded benchmark n-gram table must broadcast — the corpus side
    # streams through a map-side hash join with no shuffle of corpus text
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_two_exchange_rollup(spark):
    plan = _plan(spark, "docs_repetition")
    # one (doc,n,gram) counting exchange + one per-doc rollup exchange +
    # the final orderBy's range partitioning — nothing else. The gram
    # counting must be partially aggregated map-side before its exchange.
    hash_ex = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # the _spread round-robin repartition of the tiny scan is not a
    # hash exchange; allow exactly the two aggregation exchanges
    assert len(hash_ex) == 2, plan
    assert "partial_count" in plan or "partial" in plan, plan


def test_thread_spans_single_stream_shuffle(spark):
    plan = _plan(spark, "events_thread_spans")
    # the Python stage consumes the stream_id hash partitioning directly:
    # no extra exchange between the window stage and MapInPandas
    assert "MapInPandas" in plan, plan
    # stream_id appears as a hash partition key upstream of the Python stage
    assert re.search(r"hashpartitioning\(stream_id", plan), plan


def test_bm25_broadcasts_stats_and_topk(spark):
    plan = _plan(spark, "docs_bm25_topk")
    # df table and corpus stats are broadcast; ranking is top-k, never a
    # global Sort+CollectLimit
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the query-term filter is applied map-side against the explode — the
    # tf aggregation's exchange only carries matching term occurrences
    assert re.search(r"term#\d+ IN \(hash,|IN \(hash", plan), plan


def test_dsir_lambda_table_broadcasts(spark):
    plan = _plan(spark, "docs_dsir_weights")
    # the <= n_buckets log-ratio table joins back via broadcast — the
    # feature stream is never shuffled on the bucket key for scoring
    assert "BroadcastHashJoin" in plan, plan


def test_unigram_logprob_broadcast_totals(spark):
    plan = _plan(spark, "docs_unigram_logprob")
    # corpus totals ride in as a broadcast single-row relation (a
    # BroadcastNestedLoopJoin/cross of one row), never a window over ()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "WindowExec" not in plan, plan


def test_semdedup_single_cluster_shuffle(spark):
    """The gram-matrix pruning stage shuffles each vector exactly once
    (hash on the cluster id into FlatMapGroupsInPandas) — no pair join
    duplicating embeddings."""
    plan = _plan(spark, "emb_semdedup")
    # exactly one Python stage: vectors shuffle to their cluster once
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the oversized-cluster guard joins broadcast their (tiny) cluster
    # list: pin the exact shapes — a semi join keeping prunable clusters
    # and an anti join passing oversized ones through, both keyed on the
    # cluster id with the cluster list as the broadcast build side
    guard_joins = [
        ln
        for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "cluster#" in ln
    ]
    assert any("LeftSemi" in ln for ln in guard_joins), plan
    assert any("LeftAnti" in ln for ln in guard_joins), plan


def test_nb_classifier_sparse_model_join_and_argmax_pushdown(spark):
    """Sparse NB: the scoring join is on the term (observed model rows
    only — no vocab x classes densification, so no nested-loop join of
    two multi-row sides), per-class scalars ride as 1-row broadcasts, and
    the argmax prunes through WindowGroupLimit."""
    plan = _plan(spark, "docs_nb_classifier")
    assert "WindowGroupLimit" in plan
    # the only nested-loop joins are the broadcast scalar cross joins
    for ln in [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]:
        assert "Cross" in ln
    assert "term" in plan  # scoring join keyed on the term


def test_pagerank_small_graph_result_is_local_relation(spark):
    """Dimension-level graphs take the driver-side fast path: the result
    scans as a JVM-local relation — downstream consumers never re-execute
    the 5-way edge-build join or the power iteration."""
    plan = _plan(spark, "nations_trade_pagerank")
    assert "LocalTableScan" in plan
    assert "FileScan" not in plan


def test_containment_and_substring_no_cartesian(spark):
    """Both substring-level dedup paths build candidates from hash-key
    equi-joins (prefix explode / inverted index) — never a cross join
    over the corpus."""
    for name in ("docs_containment_dups", "docs_exact_substring"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_simhash_neardup_bucketed_no_cartesian(spark):
    """64-bit SimHash pair search: candidates come from chunk-bucket
    collects (higher-order cross inside the collected list), never a
    cartesian or posting self-join."""
    plan = _plan(spark, "docs_simhash_neardup")
    assert "CartesianProduct" not in plan, plan
    assert "Generate explode" in plan  # bucket lists exploded to pairs


def test_ppl_buckets_no_global_window(spark):
    """CCNet perplexity bucketing must label via broadcast cutoffs, not a
    global NTILE window (which would serialize the corpus on one task)."""
    plan = _plan(spark, "docs_ppl_buckets")
    assert "WindowExec" not in plan and "Window " not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_blocked_jaccard_prefix_filtered_no_cartesian(spark):
    """Round-4 retired the per-length-block self-join (O(block²) on a
    dense bucket); round-5 retired the array-shipping verify join too —
    pairs AND intersection counts both come from the (blk, h)-keyed
    df-capped inverted index (bucket explode → count aggregate), so the
    plan has equi-joins only, the bucket lists are exploded to pairs, and
    no per-pair shingle array survives into any join."""
    plan = _plan(spark, "docs_ngram_jaccard")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate explode" in plan  # posting-bucket pair explode


def test_property_get_legacy_stays_jvm_side(spark):
    """The legacy array<struct> property path is higher-order filter +
    try_element_at — no Python crossing anywhere in the plan."""
    plan = _plan(spark, "events_property_get_legacy")
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan


def test_media_pipelines_shuffle_free(spark):
    """The multimodal decode pipelines (generate → encode → decode →
    stats) must be pure map chains: at 100 TB corpus width a shuffle of
    raw media payloads is the difference between feasible and not. The
    allowed Exchanges are the final presentation orderBy, the r11 barrier
    hash repartition of the NARROW per-clip stats rows (it sits above
    every Python decode stage, so no payload bytes cross it — it exists
    so the sort's range-sampling job reuses the chain instead of running
    it twice), and the RoundRobin spread of bare doc_ids."""
    for name in ("media_ppm_roundtrip", "media_wav_roundtrip", "media_avi_roundtrip"):
        plan = _plan(spark, name)
        lines = plan.splitlines()
        # forbidden: any exchange of payload-bearing rows. Allowed, and
        # only these: the final orderBy's rangepartitioning; ONE keyed
        # barrier hashpartitioning(media_id) of the post-decode stats
        # relation (above all Python stages); the spread RoundRobin of
        # BARE doc_ids before any payload exists (below the generator
        # mapInPandas, so only 8-byte ids move).
        ex = [ln for ln in lines if "Exchange" in ln]
        assert all(
            "rangepartitioning" in ln
            or "RoundRobinPartitioning" in ln
            or "hashpartitioning(media_id" in ln
            for ln in ex
        ), (name, ex)
        assert sum("rangepartitioning" in ln for ln in ex) == 1, (name, ex)
        assert sum("hashpartitioning" in ln for ln in ex) <= 1, (name, ex)
        # every Python stage carries payload bytes; the stats barrier must
        # sit ABOVE all of them (less indented), proving it shuffles only
        # the narrow per-clip stats rows, never media payloads
        py = [ln for ln in lines if "MapInPandas" in ln or "ArrowEvalPython" in ln]
        assert py, name
        hx = [ln for ln in ex if "hashpartitioning" in ln]
        if hx:
            h_ind = len(hx[0]) - len(hx[0].lstrip(" :+-"))
            assert all(
                h_ind < len(p) - len(p.lstrip(" :+-")) for p in py
            ), (name, hx, py)
        # the RoundRobin must be deeper in the tree (below the decode
        # stages), i.e. more indented than the range exchange
        rr = [ln for ln in ex if "RoundRobinPartitioning" in ln]
        if rr:
            rng = next(ln for ln in ex if "rangepartitioning" in ln)
            assert len(rr[0]) - len(rr[0].lstrip()) > len(rng) - len(rng.lstrip())
        # payload bytes cross into Python in Arrow batches, not rows
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan, name


def test_cbor_roundtrip_minimal_exchanges(spark):
    """events_cbor_roundtrip: one hash exchange into the per-bucket block
    packer, one partial+final agg pair after parsing — nothing else (no
    payload re-shuffle between pack and parse). The presentation sort is
    the r12 bounded-result shape: Coalesce(1) + sortWithinPartitions, so
    NO rangepartitioning exchange (and no range-sampler job) exists."""
    plan = _plan(spark, "events_cbor_roundtrip")
    ex = [ln.strip() for ln in plan.splitlines() if "Exchange" in ln]
    kinds = [("hash" if "hashpartitioning" in ln else
              "range" if "rangepartitioning" in ln else "other") for ln in ex]
    assert kinds.count("other") == 0, ex
    assert kinds.count("hash") <= 2 and kinds.count("range") == 0, ex
    assert "Coalesce" in plan, plan
    # partial aggregation before the final agg exchange (map-side combine)
    assert "partial" in plan.lower()


def test_tfidf_keywords_plan_shape(spark):
    """docs_tfidf_keywords: the per-doc top-k is a WindowGroupLimit (rank
    filter pushed below the final sort), both stats joins broadcast, and
    no cartesian product appears (N rides in as a broadcast 1-row agg)."""
    plan = _plan(spark, "docs_tfidf_keywords")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_winnow_overlap_single_pass(spark):
    """docs_winnow_overlap: the expensive fingerprint HOF runs once
    map-side — the plan has no cartesian product and only hash/range
    exchanges (posting groupBys + presentation sort); candidate pairs
    come from the bucket cross, never a posting self-join."""
    plan = _plan(spark, "docs_winnow_overlap")
    assert "CartesianProduct" not in plan
    # allowed: posting/count groupBys (hash), presentation sort (range),
    # _spread's RoundRobin, and the capped-keys set broadcast back onto
    # the posting — nothing else (in particular no posting self-join SMJ)
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all(
        "hashpartitioning" in ln
        or "rangepartitioning" in ln
        or "RoundRobinPartitioning" in ln
        or "BroadcastExchange" in ln
        for ln in ex
    ), ex
    assert "SortMergeJoin" not in plan


def test_log_templates_mask_broadcast_and_two_aggs(spark):
    # the per-slot mask dimension must broadcast back (never shuffle the
    # corpus against it), and template mining is hash aggs, not sorts
    plan = _plan(spark, "events_log_templates")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_kmv_sketch_no_global_sort(spark):
    # the k-smallest build is threshold-filter + per-side collect; a
    # rangepartitioning exchange would mean a global sort of the distinct
    # hash relation crept back in
    plan = _plan(spark, "docs_kmv_overlap")
    assert "rangepartitioning" not in plan.lower()


def test_counter_rate_single_series_shuffle(spark):
    # one hashpartitioning exchange on the series key feeds the lag
    # window; the hour rollup reuses or re-shuffles the small binned rows
    plan = _plan(spark, "events_counter_rate")
    assert "hashpartitioning(user_id" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_ohlc_windows_share_hour_partitioning(spark):
    plan = _plan(spark, "events_ohlc_downsample")
    # both row_number windows and the final agg key on hour_epoch — count
    # the exchanges: the two opposite-order windows share one partitioning
    assert plan.count("hashpartitioning(hour_epoch") >= 1
    assert "CartesianProduct" not in plan


def test_weighted_sample_topk_no_global_sort(spark):
    plan = _plan(spark, "docs_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_similarity_verify_broadcast_cutoff_follows_conf(spark):
    """Round-8: the adaptive verify's broadcast-vs-struct-carry switch
    keys off spark.sql.autoBroadcastJoinThreshold instead of a constant.
    With broadcasting enabled the sizes attach is a BroadcastHashJoin on
    the pair stream; lowering the threshold to -1 (broadcast disabled)
    must flip the SAME input to the struct-carry branch — sizes inside
    the buckets, zero joins against the pair stream."""
    from pyspark.sql import functions as F

    from micromegas_spark.operators.dedup import (
        BROADCAST_SIZES_MAX_DOCS,
        _broadcast_sizes_cutoff,
        _pair_counts_with_sizes,
    )

    capped = spark.createDataFrame(
        [(i % 7, h) for i in range(40) for h in range(i % 5 + 1)],
        ["doc_id", "h"],
    ).select(F.col("doc_id").cast("long"), F.col("h").cast("long"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        assert 0 < _broadcast_sizes_cutoff(spark) <= BROADCAST_SIZES_MAX_DOCS
        plan_b = _pair_counts_with_sizes(
            capped, "doc_id", ("h",), 7
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_b
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _broadcast_sizes_cutoff(spark) == 0
        plan_s = _pair_counts_with_sizes(
            capped, "doc_id", ("h",), 7
        )._jdf.queryExecution().executedPlan().toString()
        # struct-carry: denominators ride the buckets; the pair stream is
        # never joined (broadcast or otherwise)
        assert "BroadcastHashJoin" not in plan_s
        assert "struct(i," in plan_s or "named_struct" in plan_s or "collect_list(struct" in plan_s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_parse_byte_conf_grammar():
    from micromegas_spark.operators.dedup import _parse_byte_conf

    assert _parse_byte_conf("10485760") == 10 * 1024 * 1024
    assert _parse_byte_conf("10MB") == 10 * 1024 * 1024
    assert _parse_byte_conf("10m") == 10 * 1024 * 1024
    assert _parse_byte_conf("1g") == 1024**3
    assert _parse_byte_conf("512k") == 512 * 1024
    assert _parse_byte_conf("-1") == -1
    assert _parse_byte_conf("100b") == 100


def test_emb_dedup_16_planes_bucketed_no_cartesian(spark):
    """The SCALE-PATH sign-LSH operating point (emb_dedup_clusters_16,
    measured linear sf30→sf50): plane projections are map-side
    expressions, candidates come from the plane-signature bucket collect
    — never a cartesian over the embedding table."""
    plan = _plan(spark, "emb_dedup_clusters_16")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pair_verify_collapses_duplicate_buckets_before_explode(spark):
    """VERDICT r9 task 2: the jaccard/winnow verify pre-collapses
    byte-equal bucket id-lists to (ids, weight) rows BEFORE the pair
    explode (groupBy(ids) with map-side combine), so a clone cluster's
    signature shuffles once and the pair aggregate SUMs weights instead
    of re-counting each bucket copy. Plan evidence: an aggregate keyed
    on the sorted id-list feeds the posexplode."""
    for name in ("docs_ngram_jaccard", "docs_winnow_overlap"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        # the distinct-list weight aggregate (keys=[ids...], count) runs
        # below the pair-generating explode
        agg_on_ids = [
            ln
            for ln in plan.splitlines()
            if "HashAggregate" in ln and "keys=[ids" in ln
        ]
        assert agg_on_ids, f"{name}: no (ids, weight) pre-collapse in plan"
        assert "posexplode" in plan, name
