"""Physical-plan introspection: structured access to the executed-plan
properties the 100 TB design depends on.

The engine's scale posture is "declare the plan, verify Catalyst produced
the physical shape you'd pick by hand" (filters at the scan, dims broadcast,
no extra exchanges).  These helpers turn ``df.explain`` text into checkable
facts so plan-shape regressions fail tests instead of silently costing a
full-table scan at scale.  Used by ``tests/test_plans.py``; also handy
interactively:

    >>> from guidance_for_sap_data_integration_and_management_on_aws_spark import plans
    >>> plans.pushed_filters(plans.executed_plan(df))
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

_SCAN_RE = re.compile(r"FileScan (\w+) \[([^\]]*)\][^\n]*")
# Spark truncates long filter lists mid-entry ("..." with no closing "]"),
# so accept either terminator.
_ATTR_RE = re.compile(r"(PushedFilters|PartitionFilters|DataFilters): \[(.*?)(?:\]|\.\.\.)")
_LOCATION_RE = re.compile(r"Location: [^\[\n]*\[([^\]]*)\]")


@dataclass
class FileScanInfo:
    """One FileScan operator: format, output columns, filters, source paths."""

    fmt: str
    columns: list[str]
    pushed_filters: str = ""
    partition_filters: str = ""
    data_filters: str = ""
    paths: str = ""

    def reads_table(self, name: str) -> bool:
        return name in self.paths


def executed_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-optimization, pre-AQE-finalization)."""
    return df._jdf.queryExecution().executedPlan().toString()


def file_scans(plan: str) -> list[FileScanInfo]:
    """Every FileScan in the plan with its pruned column set and filters."""
    scans: list[FileScanInfo] = []
    for m in _SCAN_RE.finditer(plan):
        line = m.group(0)
        info = FileScanInfo(
            fmt=m.group(1),
            columns=[c.split("#")[0] for c in m.group(2).split(",") if c],
        )
        for am in _ATTR_RE.finditer(line):
            setattr(info, am.group(1).replace("Filters", "_filters").lower(), am.group(2))
        lm = _LOCATION_RE.search(line)
        if lm:
            info.paths = lm.group(1)
        scans.append(info)
    return scans


def scanned_columns(plan: str) -> list[set[str]]:
    """Column sets read by each scan — the column-pruning check."""
    return [set(s.columns) for s in file_scans(plan)]


def pushed_filters(plan: str) -> list[str]:
    """Per-scan PushedFilters strings (empty string = nothing pushed)."""
    return [s.pushed_filters for s in file_scans(plan)]


def partition_filters(plan: str) -> list[str]:
    """Per-scan PartitionFilters strings — the partition-pruning check."""
    return [s.partition_filters for s in file_scans(plan)]


def n_exchanges(plan: str) -> int:
    """Shuffle count: every Exchange is a full network materialization of
    its input — the quantity to minimize at 100 TB."""
    return plan.count("Exchange")


@dataclass
class ExchangeInfo:
    """One shuffle: its partitioning expression and the schema it carries.

    The *payload* of an exchange is what actually crosses the network, so
    a wide column (ArrayType token sets, embeddings) riding a hot shuffle
    is the canonical 100 TB scale bug — ``exchange_schemas`` makes it
    assertable (see tests/test_plans.py on dedup_minhash_lsh)."""

    partitioning: str
    columns: list[tuple[str, str]]  # (name, typeName)

    def array_columns(self) -> list[str]:
        return [n for n, t in self.columns if t == "array"]

    def partitions_on(self, name: str) -> bool:
        return name in self.partitioning


def exchange_schemas(df: DataFrame) -> list[ExchangeInfo]:
    """Every Exchange node in the executed plan with its output schema,
    via the JVM plan tree (the text plan doesn't show exchange payloads)."""
    out: list[ExchangeInfo] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # AQE wrapper reports no children; descend into the plan it wraps
            walk(node.initialPlan())
            return
        if "Exchange" in name:
            attrs = node.output()
            cols = [
                (attrs.apply(i).name(), attrs.apply(i).dataType().typeName())
                for i in range(attrs.size())
            ]
            out.append(ExchangeInfo(partitioning=node.outputPartitioning().toString(), columns=cols))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out
