"""Scan-efficiency regression gate: literal predicates must reach the
parquet scan (PushedFilters) and projections must prune the read schema
(ReadSchema) — the two properties that decide whether a 100 TB scan reads
100 TB or a fraction of it. Asserted on executed plans, not on intent."""

from __future__ import annotations

import re

from real_time_flight_data_pipeline_spark.plans.catalog import REGISTRY

from .conftest import SF_SMOKE


def _scans(plan: str) -> list[str]:
    return re.findall(r"FileScan parquet[^\n]*", plan)


def _plan(spark, name: str) -> str:
    return REGISTRY[name].builder(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_literal_predicates_push_down(spark):
    """Queries with literal filters on scanned columns must show non-empty
    PushedFilters on at least one scan."""
    for name in ("shipping_priority_topk", "revenue_by_nation", "user_set_ops"):
        plan = _plan(spark, name)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any(p.strip() for p in pushed), f"{name}: no pushed filters\n{plan}"


def test_projection_prunes_read_schema(spark):
    """A query touching few columns of a wide table must not scan the full
    schema: every lineitem scan in pricing_summary reads a strict subset
    (the table has 16 columns), and docs_stratified_sample reads only the
    3 projected documents columns + nothing else."""
    # (ReadSchema is truncated in toString; the bracketed output column list
    # of the FileScan is the same information untruncated)
    plan = _plan(spark, "pricing_summary")
    for scan in _scans(plan):
        if "lineitem" not in scan:
            continue
        m = re.search(r"FileScan parquet \[([^\]]*)\]", scan)
        ncols = len([c for c in m.group(1).split(",") if c])
        assert ncols <= 7, f"pricing_summary lineitem scan reads {ncols} cols: {scan}"

    plan = _plan(spark, "docs_stratified_sample")
    for scan in _scans(plan):
        if "documents" not in scan:
            continue
        m = re.search(r"FileScan parquet \[([^\]]*)\]", scan)
        cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"doc_id", "lang", "source"}, f"unpruned scan: {scan}"
