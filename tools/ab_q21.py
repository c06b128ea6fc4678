"""A/B: tpch_q21 window plan (r13) vs two-aggregation plan (r14).

The r14 re-plan replaced a ``collect_set`` window (full fact-table
sort, two per-row set arrays) with two hash aggregations with map-side
partial combine (``queries/tpch_ext.py``). Its sf0.1 bench cell then
rose 0.592 -> 1.011 s in a round whose median host drift was 1.165x,
and the x100 cell was only ever measured under the new plan — so the
claim "the aggregation plan wins at scale" was never A/B-validated.
This harness runs BOTH plans at x1/x10/x100 (the replicated corpora
from tools/gen_replicated_sf.py) under the scaled-sweep protocol:
one fresh-JVM child per (variant, dataset) cell, one untimed warm run
at the target dataset, median of SPARK_GRAFT_BENCH_REPS (default 3)
timed noop-sink runs.

Usage:
  python tools/ab_q21.py [out.json]            # orchestrate all cells
  python tools/ab_q21.py --cell VARIANT SET    # one cell (child mode)

Result (r15, two independent sessions, full table in SCALING.md
"tpch_q21 A/B"): the WINDOW plan is fastest or tied at every SF
(x1 ~0.9-1.0 s vs agg 1.2-1.3; x10 1.4-1.6 vs 1.7-1.8; x100 5.5 vs
5.5-6.0) — the window's l_orderkey sort rides the join SMJ's existing
sort order, while the aggregation plan pays a SECOND fact-grain
exchange. A repartition-hybrid (one exchange, no sort) was also built
and measured: it ties the window at x10 and loses slightly at
x1/x100. The shipped query reverted to the window plan; this harness
keeps all three arms reproducible.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATASETS = [
    ("x1", "/root/testdata/sf0.1"),
    ("x10", "/tmp/sfx10"),
    ("x100", "/tmp/sfx100"),
]
VARIANTS = ("agg", "window", "hybrid")


def q21_agg(spark, sf_dir):
    """The RETIRED r14 plan, verbatim: two hash aggregations
    ((l_orderkey, l_suppkey) grain then l_orderkey grain). Pays TWO
    fact-grain exchanges because hashpartitioning(l_orderkey,
    l_suppkey) does not satisfy the second aggregate's l_orderkey
    clustering. Kept as a comparison arm after the r15 A/B reverted
    the shipped query to the window plan."""
    from pyspark.sql import functions as F

    from financial_data_pipeline_optimization_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
    )
    per_os = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("long")).alias("n_late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum((F.col("n_late") > 0).cast("long")).alias("n_late_supps"),
        F.max(
            F.when(F.col("n_late") > 0, F.col("l_suppkey"))
        ).alias("late_supp"),
        F.sum(
            F.when(F.col("n_late") > 0, F.col("n_late")).otherwise(
                F.lit(0)
            )
        ).alias("late_lines"),
    )
    waiting = per_o.filter(
        (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name"
        )
    )
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q21_window(spark, sf_dir):
    """The SHIPPED plan (the window plan this A/B re-shipped in r15),
    resolved from the registry so the arm always measures the code a
    user actually runs — a frozen copy here would silently drift.
    The agg/hybrid arms below are deliberately frozen copies of
    RETIRED plans."""
    from financial_data_pipeline_optimization_spark import queries as q

    return {s.name: s for s in q.registry()}[
        "tpch_q21_waiting_suppliers"
    ].spark(spark, sf_dir)


def q21_hybrid(spark, sf_dir):
    """One explicit repartition on l_orderkey, then BOTH hash
    aggregations run exchange-free: hashpartitioning(l_orderkey)
    satisfies ClusteredDistribution for the (l_orderkey, l_suppkey)
    grain AND the l_orderkey grain, so the fact table crosses the
    wire once (like the window plan) with no sort (like the agg
    plan). Candidate replacement measured by this A/B."""
    from pyspark.sql import functions as F

    from financial_data_pipeline_optimization_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = (
        li.join(
            o.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
        )
        .repartition("l_orderkey")
    )
    per_os = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("long")).alias("n_late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum((F.col("n_late") > 0).cast("long")).alias("n_late_supps"),
        F.max(
            F.when(F.col("n_late") > 0, F.col("l_suppkey"))
        ).alias("late_supp"),
        F.sum(
            F.when(F.col("n_late") > 0, F.col("n_late")).otherwise(
                F.lit(0)
            )
        ).alias("late_lines"),
    )
    waiting = per_o.filter(
        (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name"
        )
    )
    return (
        waiting.join(s, F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


#: Spec surface for the shared harness (tools/ab.py, r16): the same
#: three arms × three datasets run as
#: ``python tools/ab.py --spec tools/ab_q21.py`` — one fresh
#: quiet-gated JVM per cell, median-of-reps, incremental persist.
AB_VARIANTS = {"agg": q21_agg, "window": q21_window, "hybrid": q21_hybrid}
AB_DATASETS = DATASETS


def run_cell(variant: str, set_name: str) -> None:
    from financial_data_pipeline_optimization_spark import get_spark

    sf_dir = dict(DATASETS)[set_name]
    spark = get_spark(app_name=f"ab-q21-{variant}-{set_name}")
    fn = {"agg": q21_agg, "window": q21_window, "hybrid": q21_hybrid}[
        variant
    ]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    samples = []
    for _ in range(reps):
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.perf_counter() - start)
    samples.sort()
    print(
        "CELL "
        + json.dumps(
            {
                "variant": variant,
                "set": set_name,
                "median": round(samples[len(samples) // 2], 3),
                "samples": [round(s, 3) for s in samples],
            }
        ),
        flush=True,
    )


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2], sys.argv[3])
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_q21.json"
    results: dict[str, dict[str, dict]] = {v: {} for v in VARIANTS}
    for set_name, sf_dir in DATASETS:
        if not Path(sf_dir).exists():
            print(f"skip {set_name}: {sf_dir} missing")
            continue
        for variant in VARIANTS:
            env = dict(os.environ)
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--cell", variant, set_name],
                    capture_output=True,
                    text=True,
                    env=env,
                    timeout=1800,
                )
                cell = None
                for line in proc.stdout.splitlines():
                    if line.startswith("CELL "):
                        cell = json.loads(line[5:])
                if cell is None:
                    cell = {
                        "err": proc.stderr[-500:], "rc": proc.returncode
                    }
            except subprocess.TimeoutExpired:
                # A DNF-class cell must be RECORDED, not abort the
                # A/B and discard every completed measurement.
                cell = {"err": "timeout >1800s (DNF)", "rc": None}
            results[variant][set_name] = cell
            print(f"{variant}/{set_name}: {cell}", flush=True)
            # Persist incrementally so a later crash keeps evidence.
            Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
