"""Plan diagnostics: the ``.explain`` audit as a structured report.

The engine's performance discipline (SURVEY.md §4, PLANS.md) is a set
of plan-shape properties: filters reach the scan, projections prune
columns, small dims broadcast, hot paths stay in whole-stage codegen,
no row-at-a-time Python, no cartesian products. ``plan_report`` turns
one DataFrame's physical plan into a dict of those properties so users
(and tests — see ``tests/test_plan_quality.py`` for the gate versions)
can assert them programmatically instead of eyeballing ``.explain``
output.

Driver-side string analysis only — building the report never executes
the query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def _node_names(simple_plan: str) -> list[str]:
    """Physical-plan node names, one per tree line.

    Counting node occurrences by substring is wrong twice over: a
    ``ReusedExchange`` line *names its source exchange* in its
    description (so ``"Exchange"`` matches twice on one node), and the
    codegen-stage prefix ``*(3)`` varies. Parse each line down to its
    leading operator token instead.
    """
    names = []
    for line in simple_plan.splitlines():
        s = re.sub(r"^[\s:+\-]*", "", line)
        s = re.sub(r"^\*\(\d+\)\s*", "", s)
        if s:
            names.append(s.split(None, 1)[0])
    return names


def plan_report(df: DataFrame) -> dict:
    """Summarize the physical plan's scale-relevant properties.

    Returns a dict with:

    - ``exchanges``: number of shuffle ``Exchange`` nodes (broadcast
      exchanges counted separately) — each is a full network pass over
      its input;
    - ``broadcast_exchanges``: dimension broadcasts (cheap, bounded);
    - ``reused_exchanges``: shuffle outputs Catalyst re-reads instead
      of recomputing (free — counted separately, not as exchanges);
    - ``pushed_filters``: the ``PushedFilters`` lists per scan — empty
      lists on a filtered scan mean the predicate runs post-scan;
    - ``scan_columns``: per-scan ``ReadSchema`` column counts — a scan
      reading many more columns than the query projects lost pruning;
    - ``whole_stage_codegen``: True if any compiled span exists;
    - ``python_evals``: row-at-a-time Python UDF operators
      (``BatchEvalPython``) — engine policy forbids them in hot paths;
    - ``arrow_evals``: Arrow-batched Python operators (``MapInPandas``
      / ``ArrowEvalPython`` / ``FlatMapGroupsInPandas``) — the
      sanctioned Python boundary;
    - ``cartesian_products``: unconditional cross joins;
    - ``sort_merge_joins`` / ``broadcast_hash_joins``: join strategy
      mix.
    """
    formatted = _explain(df, "formatted")
    simple = _explain(df, "simple")
    codegen_plan = _explain(df, "codegen")

    pushed = [
        f.strip()
        for f in re.findall(r"PushedFilters: \[(.*?)\]", formatted)
    ]
    read_schemas = re.findall(r"ReadSchema: struct<(.*?)>", formatted)
    scan_columns = [
        len([c for c in schema.split(",") if c]) for schema in read_schemas
    ]
    nodes = _node_names(simple)
    return {
        # ReusedExchange re-reads an existing shuffle's output — it is
        # not a new network pass, so it must not count as an exchange.
        "exchanges": nodes.count("Exchange"),
        "reused_exchanges": nodes.count("ReusedExchange"),
        "broadcast_exchanges": nodes.count("BroadcastExchange"),
        "pushed_filters": pushed,
        "scan_columns": scan_columns,
        "whole_stage_codegen": "WholeStageCodegen" in codegen_plan,
        "python_evals": simple.count("BatchEvalPython"),
        "arrow_evals": sum(
            simple.count(op)
            for op in (
                "MapInPandas",
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
            )
        ),
        "cartesian_products": simple.count("CartesianProduct"),
        "sort_merge_joins": simple.count("SortMergeJoin"),
        "broadcast_hash_joins": simple.count("BroadcastHashJoin"),
    }
