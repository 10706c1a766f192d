"""Topological pipeline runner for the medallion DAG.

The reference's 15 jobs are orchestrated externally (Airflow per
README.md:41-42 — no DAG in repo); dependencies are implicit via S3
paths. Here the DAG is explicit: each node declares inputs, the runner
topo-sorts, materializes each node to the session catalog (so downstream
nodes re-read exactly like the reference's S3/catalog handoff), attaches
the DQ gate as an ``observe`` on the sink write (no extra pass), and
records per-node wall-clock — the reference's ``load_duration`` log
(silver/crm_cust_info_silver.py:111-114) as structured metrics.

Gold nodes that also target the warehouse double-write; the runner
caches between the two sinks instead of recomputing the plan (the
reference recomputes — dim_customers_gold.py:56-62 then :72-81).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import WarehouseSink, write_table
from .dq import DQResult, DQRule, attach_observation, evaluate_now


@dataclass
class Node:
    name: str
    fn: Callable[..., DataFrame]  # fn(*input DataFrames) -> DataFrame
    deps: Sequence[str] = ()
    sink: str | None = None  # catalog table to write; None = pass-through
    dq_rules: Sequence[DQRule] = ()
    warehouse_table: str | None = None  # optional second (warehouse) sink
    partition_by: Sequence[str] | None = None


@dataclass
class NodeResult:
    name: str
    seconds: float
    rows_written: int | None
    dq: list[DQResult] = field(default_factory=list)


class Pipeline:
    def __init__(self, nodes: Sequence[Node], warehouse: WarehouseSink | None = None):
        self.nodes = {n.name: n for n in nodes}
        if len(self.nodes) != len(nodes):
            raise ValueError("duplicate node names")
        self.warehouse = warehouse or WarehouseSink()

    def _topo_order(self) -> list[str]:
        order: list[str] = []
        state: dict[str, int] = {}  # 0=unseen 1=visiting 2=done

        def visit(name: str) -> None:
            if state.get(name) == 2:
                return
            if state.get(name) == 1:
                raise ValueError(f"cycle at {name}")
            state[name] = 1
            for d in self.nodes[name].deps:
                if d in self.nodes:
                    visit(d)
            state[name] = 2
            order.append(name)

        for name in self.nodes:
            visit(name)
        return order

    def run(
        self, spark: SparkSession, sources: dict[str, DataFrame] | None = None
    ) -> dict[str, NodeResult]:
        """Execute the DAG. ``sources`` provides DataFrames for dep names
        that are not nodes (external inputs). Raises on a failed DQ gate.
        """
        sources = sources or {}
        outputs: dict[str, DataFrame] = {}
        results: dict[str, NodeResult] = {}

        # ensure catalog databases for qualified sinks (bronze.x, gold.y)
        dbs = set()
        for n in self.nodes.values():
            for t in (n.sink, n.warehouse_table if self.warehouse.backend == "catalog" else None):
                if t and "." in t:
                    dbs.add(t.rsplit(".", 1)[0])
        for db in sorted(dbs):
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")

        def resolve(name: str) -> DataFrame:
            if name in outputs:
                return outputs[name]
            if name in sources:
                return sources[name]
            raise KeyError(f"unresolved input '{name}'")

        for name in self._topo_order():
            node = self.nodes[name]
            t0 = time.time()
            df = node.fn(*[resolve(d) for d in node.deps])
            dq: list[DQResult] = []
            rows = None
            rules = list(node.dq_rules)
            if node.sink:
                observable = [r for r in rules if r.kind != "unique"]
                unique_rules = [r for r in rules if r.kind == "unique"]
                if observable:
                    df_obs, finish = attach_observation(df, observable, f"dq_{name}")
                else:
                    df_obs, finish = df, None
                if node.warehouse_table:
                    df_obs = df_obs.cache()
                try:
                    write_table(
                        df_obs,
                        node.sink,
                        partition_by=list(node.partition_by) if node.partition_by else None,
                    )
                    if finish:
                        dq.extend(finish())
                    if unique_rules:
                        dq.extend(evaluate_now(df_obs, unique_rules))
                    # Gate BEFORE the warehouse write: the observe-based DQ
                    # results only exist once the primary (catalog) sink has
                    # executed — that write is the documented piggyback — but
                    # a failed gate must stop propagation to the second sink.
                    failed = [r for r in dq if not r.passed]
                    if failed:
                        raise RuntimeError(f"DQ gate failed at {name}: {failed}")
                    if node.warehouse_table:
                        self.warehouse.write(df_obs, node.warehouse_table)
                finally:
                    if node.warehouse_table:
                        df_obs.unpersist()
                out = spark.table(node.sink)
                rows = next((int(r.observed) for r in dq if r.rule == "row_count"), None)
            else:
                if rules:
                    dq.extend(evaluate_now(df, rules))
                out = df
            failed = [r for r in dq if not r.passed]
            if failed:
                raise RuntimeError(f"DQ gate failed at {name}: {failed}")
            outputs[name] = out
            results[name] = NodeResult(name, round(time.time() - t0, 3), rows, dq)
        return results
