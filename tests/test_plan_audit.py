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
