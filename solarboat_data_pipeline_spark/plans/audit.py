"""Physical-plan audit: make scale properties testable.

The 100 TB discipline — filters reach the parquet scan, small sides
broadcast, nothing degenerates into a cartesian/nested-loop join, ordered
operators avoid O(n²) window frames — is asserted in tests via these
helpers instead of being eyeballed in ``.explain`` output once and then
silently regressing.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The ``df.explain(mode)`` text (PySpark only prints it)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """All ``PushedFilters: [...]`` entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(plan: str) -> list[str]:
    """The ``ReadSchema`` struct strings — verify column pruning."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def has_broadcast_hash_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan


def has_cartesian_join(plan: str) -> bool:
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def has_unbounded_following_frame(plan: str) -> bool:
    """The O(n²) window shape: a frame ending at unboundedfollowing makes
    Spark recompute the whole frame per row."""
    return bool(re.search(r"unboundedfollowing", plan, re.IGNORECASE))


def shuffle_count(plan: str) -> int:
    """Number of distinct Exchange operators (shuffles) in the plan.
    Formatted explain lists each operator twice (tree + details), so count
    unique operator ids; fall back to raw matches for other modes.
    ``BroadcastExchange`` is deliberately excluded — it is not a shuffle."""
    # an executed AQE plan prints "== Final Plan ==" AND "== Initial
    # Plan ==" — count only the final tree, not the superseded one
    m = re.search(r"== Final Plan ==(.*?)== Initial Plan ==", plan, re.DOTALL)
    scope = m.group(1) if m else plan
    ids = set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", scope))
    if ids:
        return len(ids)
    return len(re.findall(r"(?<!Broadcast)\bExchange\b", scope))


def codegen_stage_count(plan: str) -> int:
    """Whole-stage-codegen stages. Pass a ``codegen``-mode plan: with AQE
    enabled the simple/formatted plans hide codegen markers until the final
    plan exists, while codegen mode reports "Found N WholeStageCodegen
    subtrees" up front."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    if m:
        return int(m.group(1))
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


@dataclass
class PlanAudit:
    plan: str
    pushed_filters: list[str] = field(init=False)
    shuffles: int = field(init=False)
    codegen_stages: int = field(init=False)
    broadcast_join: bool = field(init=False)
    cartesian_join: bool = field(init=False)
    unbounded_following: bool = field(init=False)

    simple_plan: str = ""

    def __post_init__(self) -> None:
        self.pushed_filters = pushed_filters(self.plan)
        self.shuffles = shuffle_count(self.plan)
        self.codegen_stages = codegen_stage_count(self.simple_plan or self.plan)
        self.broadcast_join = has_broadcast_hash_join(self.plan)
        self.cartesian_join = has_cartesian_join(self.plan)
        self.unbounded_following = has_unbounded_following_frame(self.plan)


def audit(df: DataFrame, execute: bool = False) -> PlanAudit:
    """Audit the physical plan. ``execute=True`` runs the query first so
    the AQE *final* plan (with codegen markers, runtime join choices, and
    coalesced shuffles) is inspected instead of the initial plan."""
    if execute:
        # must run the DataFrame's OWN QueryExecution (a write wraps it in
        # a new one and the original would stay isFinalPlan=false)
        df.collect()
    return PlanAudit(explain_string(df), simple_plan=explain_string(df, "simple"))
