"""Scale-regression gate (tools/bench_scaled.py --check).

The r9 replicated-corpus sweep caught three real scale bugs by hand
(output-quadratic interval pairs, two lineitem-grain join expansions).
These tests pin the gate that automates that catch: per-query growth
budgets in tools/scale_budgets.json, checked by check_growth().

The integration test times an actual deliberately-quadratic toy plan —
the same all-pairs enumeration shape as the r9 interval_overlap bug —
through the harness's timing methodology (noop sink, perf_counter) and
asserts the gate flags it while a linear control passes. Run on a
single partition so parallelism can't hide the quadratic work and the
single-core timing is stable.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from bench_scaled import (  # noqa: E402
    BUDGETS_PATH,
    QUERIES,
    allowed_growth,
    check_growth,
    load_budgets,
)

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_budget_file_covers_the_sweep():
    budgets = load_budgets()
    assert "_default" in budgets
    missing = [q for q in QUERIES if q not in budgets]
    assert not missing, f"sweep queries without a budget: {missing}"


def test_allowed_growth_extrapolates_by_exponent():
    # x10 step: the budget verbatim.
    assert allowed_growth(25.0, 10.0) == 25.0
    # x100 step: exponent doubles -> budget squared.
    assert abs(allowed_growth(25.0, 100.0) - 625.0) < 1e-6
    # Smaller step: strictly tighter than the x10 budget.
    assert 1.0 < allowed_growth(25.0, 4.0) < 25.0


def test_synthetic_quadratic_fails_and_linear_passes():
    results = {
        "linear_plan": {"x10": 1.0, "x100": 9.0},
        "quadratic_plan": {"x10": 1.0, "x100": 100.0},
        "overhead_bound": {"x10": 0.05, "x100": 4.0},  # skipped: lo<0.2s
        "unmeasured": {"x10": 1.0, "x100": None},
    }
    violations = check_growth(results, {"_default": 25.0})
    assert len(violations) == 1 and "quadratic_plan" in violations[0]


def test_checked_in_sweep_results_hold_their_budgets():
    """BENCH_SCALED.json (the r9 measured sweep) must pass the gate —
    the budgets are calibrated ~2x above those measurements, so this
    pins artifact/budget consistency and fails if either drifts."""
    import json

    path = REPO_ROOT / "BENCH_SCALED.json"
    results = json.loads(path.read_text())
    assert check_growth(results) == []


def test_deliberately_quadratic_toy_fails_the_gate(spark):
    """Time a real quadratic plan (all-pairs self-join, the
    interval_overlap r9 bug class) at n and 4n on one core and run the
    measured wall times through the gate at ratio=4. Ideal quadratic
    growth is 16x vs an allowed ~6.9x (25^log10(4)), so the gate must
    trip even with generous timing noise; the linear control (same
    scan, no pair expansion) must pass."""

    def time_noop(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def quadratic(n):
        base = spark.range(n).coalesce(1).withColumn("g", F.lit(1))
        pairs = base.alias("a").join(base.alias("b"), "g").where(
            F.col("a.id") < F.col("b.id")
        )
        # shiftright keeps the ANSI-mode sum inside long range even at
        # billions of pair rows.
        return pairs.agg(
            F.sum(
                F.shiftright(F.xxhash64(F.col("a.id"), F.col("b.id")), 33)
            ).alias("s")
        )

    def linear(n):
        return (
            spark.range(n)
            .coalesce(1)
            .agg(F.sum(F.shiftright(F.xxhash64("id"), 33)).alias("s"))
        )

    ratio = 4
    # Warm both shapes once so JIT/codegen cost lands outside the
    # timed cells (the harness's worker-pool warm-up analogue).
    time_noop(quadratic(500))
    time_noop(linear(500))
    # Adaptive sizing: the assertion is about wall-clock GROWTH of real
    # Spark jobs, so the lo cell must comfortably clear both the gate's
    # 0.2 s floor and fixed job-launch overhead (which compresses the
    # measured ratio) on any host speed. Double n until the lo cell
    # costs >= 0.5 s — quadratic cost quadruples per doubling, so this
    # converges in a few steps on even a very fast host.
    n_lo, t_lo = 8000, time_noop(quadratic(8000))
    while t_lo < 0.5 and n_lo < 256_000:
        n_lo *= 2
        t_lo = time_noop(quadratic(n_lo))
    assert t_lo >= 0.5, f"host too fast even at n={n_lo}: {t_lo}"
    results = {
        "toy_quadratic": {
            "x10": t_lo,
            "x100": time_noop(quadratic(n_lo * ratio)),
        },
        "toy_linear": {
            # The linear control is sub-overhead at this n; lift it
            # over the gate's 0.2 s floor by timing a larger scan so
            # it is actually asserted, not skipped.
            "x10": time_noop(linear(20_000_000)),
            "x100": time_noop(linear(80_000_000)),
        },
    }
    budgets = {"_default": load_budgets()["_default"]}
    violations = check_growth(results, budgets, ratio=ratio)
    assert any("toy_quadratic" in v for v in violations), (
        f"gate missed the quadratic toy: {results}"
    )
    assert not any("toy_linear" in v for v in violations), (
        f"gate false-positived on the linear control: {violations} "
        f"{results}"
    )


def test_budgets_doc_points_at_gate():
    assert BUDGETS_PATH.exists()
