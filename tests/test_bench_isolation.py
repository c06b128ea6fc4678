"""bench.py failure isolation: one red query must never zero the
artifact.

Round 10's lesson: the bucketed-pagerank warm-up crashed at
bench.py's fail-fast warm-up line and BENCH_r10.json carried ZERO
numbers for the other 37 headliners. The contract pinned here: a
deliberately-raising spec (in warm-up AND in the timed loop) records a
per-query error while every healthy query still reports a timing, and
the stdout JSON line parses.
"""

from __future__ import annotations

import json

from .conftest import SF_SMOKE


def test_raising_spec_does_not_zero_the_artifact(
    spark, monkeypatch, capsys, tmp_path
):
    import bench
    from financial_data_pipeline_optimization_spark import queries as q

    def _boom(spark, sf_dir):
        raise RuntimeError("deliberate bench-isolation probe")

    monkeypatch.setattr(
        bench,
        "HEADLINE",
        ["group_agg_pricing_summary", "boom_spec", "topk_orders"],
    )
    monkeypatch.setattr(bench, "SF_DIR", SF_SMOKE)
    monkeypatch.setattr(bench, "INDEX_WARMUPS", ("boom_spec",))
    monkeypatch.setattr(
        bench,
        "EXTRA_SPECS",
        {"boom_spec": q.QuerySpec("boom_spec", _boom, None)},
    )
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", "1")
    # Keep the isolation probe fast and hermetic: no quiet-host wait
    # (the shared host may be loud) and no fresh-JVM drift children.
    monkeypatch.setenv("SPARK_GRAFT_BENCH_QUIET_WAIT", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DRIFT", "0")
    monkeypatch.setattr(bench, "DETAIL_PATH", tmp_path / "detail.json")

    bench.main()

    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    detail = json.loads((tmp_path / "detail.json").read_text())
    assert "boom_spec" in detail["errors"]
    assert "deliberate bench-isolation probe" in detail["errors"]["boom_spec"]
    assert out["metric"] == "headline_queries_total_sec"
    # The two healthy queries report medians; the raiser reports err.
    assert "group_agg_pricing_summary" in out["queries"]
    assert "topk_orders" in out["queries"]
    assert "boom_spec" not in out["queries"]
    assert "boom_spec" in out["err"]
    assert out["value"] > 0


def test_timed_loop_failure_is_isolated(
    spark, monkeypatch, capsys, tmp_path
):
    """A spec that passes warm-up but raises while being TIMED is also
    contained (warm-up isolation alone wouldn't have saved r10 had the
    crash been data-dependent). Warm-up only touches HEADLINE[0] and
    INDEX_WARMUPS, so a raiser in second position reaches the timed
    loop directly."""
    import bench
    from financial_data_pipeline_optimization_spark import queries as q

    calls = {"n": 0}

    def _flaky(spark, sf_dir):
        calls["n"] += 1
        raise RuntimeError("timed-loop probe")

    monkeypatch.setattr(
        bench, "HEADLINE", ["topk_orders", "flaky_spec"]
    )
    monkeypatch.setattr(bench, "SF_DIR", SF_SMOKE)
    monkeypatch.setattr(bench, "INDEX_WARMUPS", ())
    monkeypatch.setattr(bench, "DETAIL_PATH", tmp_path / "detail.json")
    monkeypatch.setattr(
        bench,
        "EXTRA_SPECS",
        {"flaky_spec": q.QuerySpec("flaky_spec", _flaky, None)},
    )
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_QUIET_WAIT", "0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DRIFT", "0")

    bench.main()

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "topk_orders" in out["queries"]
    assert "flaky_spec" in out["err"]
    assert calls["n"] >= 1


def test_prior_round_queries_ignores_suffixed_artifacts(
    monkeypatch, tmp_path
):
    """r17 measurement-bug fix: only canonical BENCH_r{N}.json files
    may supply the drift comparator's priors. Suffixed variants (e.g.
    the 8-core scaling run BENCH_r16_c8.json) used to win the round
    slot on glob order and turn every 32-core cell into a phantom
    'improvement' flag."""
    import json as _json

    import bench

    (tmp_path / "BENCH_r16.json").write_text(
        _json.dumps({"parsed": {"queries": {"qa": 1.0}}})
    )
    (tmp_path / "BENCH_r16_c8.json").write_text(
        _json.dumps({"parsed": {"queries": {"qa": 5.0, "qz": 9.0}}})
    )
    (tmp_path / "BENCH_r15.json").write_text(
        _json.dumps({"parsed": {"queries": {"qa": 3.0}}})
    )

    class _P:
        def __init__(self, p):
            self._p = p

        def glob(self, pat):
            return tmp_path.glob(pat)

        def resolve(self):
            return self

        @property
        def parent(self):
            return self

    monkeypatch.setattr(bench, "Path", lambda p=None: _P(p))
    rnd, prior = bench._prior_round_queries()
    assert rnd == 16 and prior == {"qa": 1.0}, (rnd, prior)


def test_drift_recheck_flags_and_publication(monkeypatch):
    """r16 drift protocol: only cells >1.4x their prior-round median
    are flagged (worst first, bounded); the fresh-JVM cell's median is
    published ONLY when the fresh run was quiet and back under the
    threshold — every other case keeps the in-session number."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_DRIFT", "1")
    monkeypatch.setattr(
        bench,
        "_prior_round_queries",
        lambda: (15, {"qa": 0.5, "qb": 1.0, "qc": 0.4}),
    )

    calls = []

    class _Proc:
        returncode = 0
        stderr = ""
        stdout = (
            'CELL {"median": 0.52, "quiet": true, "load_pre": 0.3, '
            '"load_max": 0.4, "samples": [0.52]}'
        )

    def _fake_run(argv, **kw):
        calls.append(argv)
        return _Proc()

    monkeypatch.setattr(bench.subprocess, "run", _fake_run)

    # qa regressed 4x (flag), qb 1.2x (no flag), qd has no prior.
    timings = {"qa": 2.0, "qb": 1.2, "qd": 9.9}
    checks = bench._drift_recheck(timings, "/root/testdata/sf0.001")
    assert set(checks) == {"qa"} and len(calls) == 1
    assert "--cell-query" in calls[0] and "qa" in calls[0]
    assert checks["qa"]["in_session"] == 2.0
    assert checks["qa"]["prior"] == 0.5 and checks["qa"]["ratio"] == 4.0

    # Publication: fresh is quiet and 0.52 <= 1.4*0.5 -> published.
    bench._apply_drift_publication(timings, checks)
    assert timings["qa"] == 0.52
    assert checks["qa"]["published"] == "fresh"

    # A loud fresh run must NOT be published even if fast.
    timings2 = {"qa": 2.0}
    checks2 = {
        "qa": {"median": 0.52, "quiet": False, "prior": 0.5,
               "in_session": 2.0}
    }
    bench._apply_drift_publication(timings2, checks2)
    assert timings2["qa"] == 2.0
    assert checks2["qa"]["published"] == "in_session"

    # A fresh run that CONFIRMS the slowdown keeps the in-session
    # number (the regression is real).
    timings3 = {"qa": 2.0}
    checks3 = {
        "qa": {"median": 1.9, "quiet": True, "prior": 0.5,
               "in_session": 2.0}
    }
    bench._apply_drift_publication(timings3, checks3)
    assert timings3["qa"] == 2.0
    assert checks3["qa"]["published"] == "in_session"

    # SYMMETRIC flagging (r17, VERDICT #3): a >1.4x IMPROVEMENT is
    # re-measured too …
    calls.clear()
    timings4 = {"qb": 0.5}  # prior 1.0 -> ratio 0.5, outside the band
    checks4 = bench._drift_recheck(timings4, "/root/testdata/sf0.001")
    assert set(checks4) == {"qb"} and len(calls) == 1
    assert checks4["qb"]["ratio"] == 0.5
    # … but the improvement direction is ANNOTATION-ONLY: the
    # in-session number always publishes (the fresh ab.py child has no
    # ramp top-up, so swapping it in would change methodology
    # mid-series for C2-ramping cells), whether the fresh run refutes …
    checks4["qb"]["median"] = 0.95
    bench._apply_drift_publication(timings4, checks4)
    assert timings4["qb"] == 0.5
    assert checks4["qb"]["published"] == "in_session"
    # … or confirms the improvement.
    timings5 = {"qb": 0.5}
    checks5 = {
        "qb": {"median": 0.52, "quiet": True, "prior": 1.0,
               "in_session": 0.5}
    }
    bench._apply_drift_publication(timings5, checks5)
    assert timings5["qb"] == 0.5
    assert checks5["qb"]["published"] == "in_session"

    # Kill switch: no children spawned.
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DRIFT", "0")
    assert bench._drift_recheck({"qa": 9.0}, "x") == {}


def test_ab_harness_spec_and_cell(monkeypatch):
    """tools/ab.py (r16): the q21 spec loads through the shared
    harness, the quiet gate resolves its knobs from env at call time,
    and measure_fn produces a complete cell in-process."""
    import os as _os

    from tools import ab

    variants, datasets = ab._load_spec("tools/ab_q21.py")
    assert set(variants) == {"agg", "window", "hybrid"}
    assert dict(datasets)["x1"] == "/root/testdata/sf0.1"

    # Env-dynamic gate: a huge bound accepts any host instantly.
    monkeypatch.setenv("SPARK_GRAFT_AB_MAXLOAD", "1e9")
    load, quiet = ab.wait_for_quiet()
    assert quiet and load < 1e9

    # Zero timeout + tiny bound: returns immediately, loud.
    monkeypatch.setenv("SPARK_GRAFT_AB_MAXLOAD", "0.0")
    monkeypatch.setenv("SPARK_GRAFT_AB_QUIET_WAIT", "0")
    _, quiet = ab.wait_for_quiet()
    assert not quiet

    # In-process cell on the smoke table (no child JVM in unit tests;
    # the child path is exercised via the same measure_fn).
    monkeypatch.setenv("SPARK_GRAFT_AB_MAXLOAD", "1e9")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", "1")

    def _tiny(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/region.parquet")

    cell = ab.measure_fn(_tiny, SF_SMOKE, app_name="ab-test")
    assert cell["median"] > 0 and len(cell["samples"]) == 1
    assert cell["quiet"] is True
    assert _os.environ["SPARK_GRAFT_AB_MAXLOAD"] == "1e9"


def test_load_sampler_steal_channel(monkeypatch):
    """r16: hypervisor steal is a second acceptance channel — a
    co-tenant VM slows every cell uniformly while the in-VM process
    scan reads ~0 external cores (measured: a streaming re-base came
    back 2-4x slow on every scenario at ext_cores_mean 0.03). The
    sampler must read /proc/stat steal, publish mean/max, and flip
    host_quiet when the sustained steal exceeds the bound."""
    import time as _time

    from tools import ab

    assert ab._steal_ticks() >= 0.0

    # Real short sampling window on (presumably) unstolen hardware:
    # the channel exists and reports sane values. (Polls under the
    # sampler's 0.5 s clean-interval floor are discarded, so poll
    # slower than that.)
    s = ab.LoadSampler(poll_s=0.6)
    _time.sleep(1.5)
    s.stop()
    assert s.steal_cores_mean >= 0.0
    assert s.steal_cores_max >= s.steal_cores_mean

    # Simulated co-tenant wave (r17, ADVICE): drive _sample_ext
    # DIRECTLY with a synthetic prev tuple instead of sleeping and
    # hoping the background thread lands a >0.5 s poll window on a
    # loaded CI host — the sampler thread is parked on a long poll and
    # never contributes. prev claims 96 cumulative steal seconds two
    # seconds ago; the patched tick source reads 100 now → 2 stolen
    # cores/s, above the 1.5 bound.
    monkeypatch.setattr(ab, "_steal_ticks", lambda: 100.0)
    monkeypatch.setenv("SPARK_GRAFT_AB_MAXLOAD", "1.5")
    monkeypatch.setenv("SPARK_GRAFT_AB_QUIET_WAIT", "0")
    s = ab.LoadSampler(poll_s=3600.0)
    s._sample_ext((_time.monotonic() - 2.0, {}, 96.0))
    s.stop()
    assert s.steal_cores_mean > 1.5
    qs = ab.QuietSession.__new__(ab.QuietSession)
    qs.quiet = True
    qs.load_pre = 0.0
    qs.load_max = 0.0
    qs.ext_cores_max = 0.0
    qs.ext_cores_mean = 0.0
    qs.steal_cores_mean = s.steal_cores_mean
    qs.steal_cores_max = s.steal_cores_max
    stamp = qs.stamp()
    assert stamp["host_quiet"] is False
    assert stamp["steal_cores_mean"] > 1.5


def test_jvm_log_classifier(monkeypatch, tmp_path):
    """The r15 JVM-log containment: exception-class counting, the
    benign allow-list (the cleaned-accumulator race signature), and
    visible failure for anything else."""
    import bench

    log = tmp_path / "jvm.log"
    log.write_text(
        "26/08/16 16:39:58 ERROR DAGScheduler: Failed to update "
        "accumulator 29118 (Unknown class) for task 31\n"
        "org.apache.spark.SparkException: attempted to access "
        "non-existent accumulator 29118\n"
        "\tat org.apache.spark.scheduler.DAGScheduler"
        ".updateAccumulators(DAGScheduler.scala:1787)\n"
        "org.apache.spark.SparkException: attempted to access "
        "non-existent accumulator 29119\n"
        "26/08/16 16:40:01 WARN BlockManager: Block rdd_1_0 exists\n"
        "java.lang.OutOfMemoryError: Java heap space\n"
        "\tat example.Frame.alloc(Frame.java:1)\n"
    )
    monkeypatch.setattr(bench, "JVM_LOG_PATH", str(log))
    counts, bad = bench._classify_jvm_log()
    assert counts == {
        "org.apache.spark.SparkException": 2,
        "java.lang.OutOfMemoryError": 1,
    }
    # The accumulator race is benign; the OOM must surface.
    assert len(bad) == 1 and bad[0].startswith(
        "java.lang.OutOfMemoryError"
    )
    # Missing log file: no counts, no failures (never crash the bench).
    monkeypatch.setattr(bench, "JVM_LOG_PATH", str(tmp_path / "nope"))
    assert bench._classify_jvm_log() == ({}, [])


def test_jvm_log_classifier_prefixed_and_caused_by(monkeypatch, tmp_path):
    """r16 (ADVICE): an exception EMBEDDED in a prefixed log message
    (TaskSetManager's 'Lost task ...: cls: msg' shape, where the
    trace is %m, not %ex) must be counted and benign-checked; a
    'Caused by:' frame is part of its parent trace — never a separate
    instance — surfacing in the non-benign list only when the parent
    itself was non-benign."""
    import bench

    log = tmp_path / "jvm.log"
    log.write_text(
        # Embedded in a prefixed WARN — previously invisible.
        "26/08/16 16:39:58 WARN TaskSetManager: Lost task 3.0 in "
        "stage 9.0 (TID 31): java.lang.OutOfMemoryError: "
        "Java heap space\n"
        # Embedded benign race inside a prefixed line: counted, benign.
        "26/08/16 16:40:00 WARN TaskSetManager: Lost task 4.0: "
        "org.apache.spark.SparkException: attempted to access "
        "non-existent accumulator 7\n"
        # Non-benign head with a chained cause: ONE instance; the
        # cause class surfaces for diagnosis but adds no count.
        "java.lang.RuntimeException: executor died\n"
        "\tat example.A.run(A.java:1)\n"
        "Caused by: java.io.IOException: broken pipe\n"
        "\tat example.B.io(B.java:2)\n"
        # Benign head with a cause: cause stays invisible.
        "java.lang.IllegalStateException: garbage collected "
        "accumulator 9\n"
        "Caused by: java.lang.IllegalArgumentException: gone\n"
        # Prefixed line with no embedded exception: skipped.
        "26/08/16 16:40:02 WARN BlockManager: Block rdd_1_0 exists\n"
    )
    monkeypatch.setattr(bench, "JVM_LOG_PATH", str(log))
    counts, bad = bench._classify_jvm_log()
    assert counts == {
        "java.lang.OutOfMemoryError": 1,
        "org.apache.spark.SparkException": 1,
        "java.lang.RuntimeException": 1,
        "java.lang.IllegalStateException": 1,
    }
    bad_classes = {b.split(":")[0] for b in bad}
    assert bad_classes == {
        "java.lang.OutOfMemoryError",
        "java.lang.RuntimeException",
        "java.io.IOException",  # cause of the non-benign parent
    }
