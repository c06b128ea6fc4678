"""Wall time vs corpus size in the COMPUTE-dominated regime.

`bench.py` tracks the driver scale factors (sf0.001-sf0.1), where every
headliner is overhead-dominated (SCALING.md: a 10x data step costs at
most ~3x). This harness times a representative subset of the headliners
on the k-replicated corpora from `tools/gen_replicated_sf.py` (10x and
100x the sf0.1 row counts — 6M / 60M lineitem rows, 50k / 500k docs),
where per-query cost is dominated by real shuffle/scan/compute work, so
the measured growth factor is the scaling exponent the 100 TB claim
rides on.

Methodology mirrors bench.py: one warm session, noop sink (full
column-set execution, nothing collected), median of SPARK_GRAFT_BENCH_REPS
after a warm-up of the Python worker pool. Default 3 reps since r14 —
a TRUE median: the old worse-of-2 default recorded the slow mode of a
bimodal cell whenever either rep hit it (the storage-pressure mode the
per-rep gc= evidence lines in the children.log document, e.g. skx100
near_dup_clusters_lsh 20.3s vs 271s), which polluted growth ratios
with harness-state noise; the median of 3 records the typical mode and
the outlier stays visible in the log. Set SPARK_GRAFT_BENCH_REPS=2 to
reproduce the old conservative bound.

Usage:
  python tools/gen_replicated_sf.py /root/testdata/sf0.1 10 /tmp/sfx10
  python tools/gen_replicated_sf.py /root/testdata/sf0.1 100 /tmp/sfx100
  python tools/bench_scaled.py [out.json] [--check]

``--check`` (or SPARK_GRAFT_SCALED_CHECK=1) turns the sweep into a
regression gate: every query with both an x10 and an x100 cell is held
to its growth budget in ``tools/scale_budgets.json`` (~2x the r9
measured growth; see the budget file's _doc). Violations are printed
and the process exits 1 — this is the gate that would have caught the
three r9 scale bugs (output-quadratic interval pairs, lineitem-grain
join expansion) before they shipped.

One-pass memory protocol (r13): the two PLAIN re-shuffling graph
variants are the only cells that have ever OOM'd the sweep's
documented 48g heap at x100 (superseded localCheckpoint block pressure
— SCALING.md memory note); everything else completes with headroom.
Instead of sizing the WHOLE sweep for its two worst citizens, the
harness runs those cells' x100 leg in an ISOLATED child process with
its own bigger heap after the main sweep finishes (the parent session
is stopped first, so the heaps never coexist), merging into the same
out.json via the resume protocol. Documented one-pass configuration:
``SPARK_DRIVER_MEMORY=48g`` for the main sweep,
``SPARK_GRAFT_SCALED_ISOLATE_MEM`` (default 64g) for the isolated leg.
``SPARK_GRAFT_SCALED_ISOLATE`` overrides the isolated set ("" disables
isolation entirely).

Per-cell isolation protocol (``--percell``, r13 — the DEFAULT for
recorded sweeps from this round on): the r13 cold one-pass run
exposed that a single long-lived session CONTAMINATES late cells —
after ~230 timed runs the same queries measured up to 10x their
isolated cost (tpch_q21 x100: 52.4 s in-session vs 5.3 s isolated;
tpch_q9 22.7 vs 4.5; lang_id_heuristic 11.9 vs 2.1; knn_pq_search
2.9 vs 1.2 — reproduced, not noise), tripping five growth gates on
harness state rather than plan scaling. The r12 sweep dodged this by
ACCIDENT: its mid-sweep OOM + resume split the x100 leg across fresh
sessions. ``--percell`` makes that hygiene deliberate: the parent
launches one child process per (query, dataset) cell — fresh JVM,
fresh session, nothing carried over — and each child warms JIT /
codegen / the Python worker pool by running ITS query once untimed
at the TARGET dataset (``SPARK_GRAFT_SCALED_WARM_DIR``) before the
timed reps, so rep 1 is not a cold-JIT/C2-ramp sample and the numbers
stay comparable to the old warm-session protocol's steady state. Cells merge into
out.json via the resume protocol, so an interrupted sweep continues
where it stopped. Memory: x1/x10 children run on SPARK_DRIVER_MEMORY
(default 48g); EVERY x100-grade child gets ISOLATE_MEM (default 64g)
— protocol validation showed several x100 cells (bucketed graph
variants, star_join, q21) bimodal between a GC-bound 48g mode (2-6x
slower) and a steady 64g mode, and since children run alone the big
heap costs nothing. ``SPARK_GRAFT_SCALED_ISOLATE`` only matters for
the legacy warm-session path.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from financial_data_pipeline_optimization_spark import get_spark
from financial_data_pipeline_optimization_spark import queries as q

DATASETS = [
    ("x1", "/root/testdata/sf0.1"),
    ("x10", "/tmp/sfx10"),
    ("x100", "/tmp/sfx100"),
]

#: Representative compute-heavy subset of the bench headliners — one
#: per physical shape (scan-agg, fact-dim joins, window, dedup chain,
#: LSH banding, CC iteration, graph iteration, token shuffles, ANN
#: serving, interval join, packing).
QUERIES = [
    "group_agg_pricing_summary",
    "flagship_monthly_segment_revenue",
    "star_join_revenue_by_region",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "dedup_keep_latest",
    "window_moving_avg",
    "exact_dedup_docs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_16x4",
    "near_dup_clusters_lsh",
    "near_dup_clusters_lsh_16x4",
    "pmi_bigram_phrases",
    "substring_dedup_docs",
    "substring_dedup_n50",
    "bm25_topk_docs",
    "unigram_logprob_score",
    "pagerank_3iter",
    "pagerank_3iter_bucketed",
    "triangle_count_order_bursts",
    "kcore_trade_graph",
    "kcore_trade_graph_bucketed",
    "pack_chunks_bins",
    # r12 repeated-tokenize-audit cells: each was measured, fixed (or
    # honestly left alone), and is now regression-gated here so a
    # reintroduced duplicate evaluation trips its growth budget.
    "bigram_interp_logprob",
    "quality_filter",
    "relative_length_filter",
    "lang_id_heuristic",
    "template_prefix_flags",
    "knn_brute_force",
    "knn_ivf_search",
    "knn_pq_search",
    "pca_top_component",
    "interval_overlap_weekly",
    "asof_join_last_view",
    # r13 audit-floor cells (VERDICT r12 #2): these were cleared in the
    # r12 tokenize audit as "at the single-evaluation floor" — but that
    # floor then dropped ~40x with the tokenizer swap, so a hidden
    # second evaluation would be invisible without post-swap cells.
    "text_stats",
    "vocab_coverage",
    "doc_fingerprint",
    "decontaminate_vs_benchmark",
    "contamination_report",
    # r13: the curation funnel's video leg in isolation (VERDICT r12
    # #5): frame sampling -> per-frame PNG dHash -> banded Hamming
    # join -> distinct pairs, one video per document.
    "video_frame_dedup_pairs",
]

#: Queries whose x100 cells run in the isolated child process (the
#: only cells that have OOM'd the 48g one-pass heap; see module doc).
DEFAULT_ISOLATE = "pagerank_3iter,kcore_trade_graph"

#: One-time index / layout builds excluded from the timed region
#: (bench.py's train/search split contract).
WARM_QUERIES = (
    "knn_pq_search",
    "knn_ivf_search",
    "pagerank_3iter_bucketed",  # src-bucketed edge-table write
    "kcore_trade_graph_bucketed",  # shares the same table
)

BUDGETS_PATH = Path(__file__).resolve().parent / "scale_budgets.json"


def load_budgets(path: Path = BUDGETS_PATH) -> dict[str, float]:
    """Per-query max x10->x100 growth, keys starting with ``_doc``
    stripped; ``_default`` covers unbudgeted queries."""
    raw = json.loads(path.read_text())
    return {k: float(v) for k, v in raw.items() if not k.startswith("_doc")}


def allowed_growth(max_x10_growth: float, ratio: float = 10.0) -> float:
    """Budgeted growth for a data-scale step of ``ratio``.

    Budgets are stated for a x10 step; a plan whose cost is c*n^e grows
    by ratio^e per step, so the implied exponent cap e = log10(budget)
    extrapolates to budget^log10(ratio) for other step sizes (used by
    the toy-query gate test, which runs a smaller step to stay fast).
    """
    return max_x10_growth ** math.log10(ratio)


def check_growth(
    results: dict[str, dict[str, float | None]],
    budgets: dict[str, float] | None = None,
    lo: str = "x10",
    hi: str = "x100",
    ratio: float = 10.0,
    budget_prefix: str = "",
) -> list[str]:
    """Return one violation line per query whose lo->hi growth exceeds
    its budget. Cells that are missing/None/sub-overhead (<0.2 s lo —
    growth over a startup-noise floor is meaningless) are skipped.
    ``budget_prefix`` namespaces the budget lookup (the zipf sweep
    gates against 'zipf:<name>' keys so the two corpora's exponents
    are budgeted independently)."""
    budgets = load_budgets() if budgets is None else budgets
    default = budgets.get(budget_prefix + "_default", budgets.get("_default", 25.0))
    violations = []
    for name, row in sorted(results.items()):
        t_lo, t_hi = row.get(lo), row.get(hi)
        if not isinstance(t_lo, (int, float)) or not isinstance(
            t_hi, (int, float)
        ):
            continue
        if t_lo < 0.2:
            continue
        growth = t_hi / t_lo
        cap = allowed_growth(budgets.get(budget_prefix + name, default), ratio)
        if growth > cap:
            violations.append(
                f"{name}: {lo}->{hi} growth {growth:.1f}x exceeds "
                f"budget {cap:.1f}x ({t_lo:.2f}s -> {t_hi:.2f}s)"
            )
    return violations


def build_specs(queries: list[str]) -> dict:
    """Registry specs plus the bench-only (no-oracle) cells."""
    specs = {s.name: s for s in q.registry()}
    specs.setdefault(
        "minhash_lsh_pairs",
        q.QuerySpec("minhash_lsh_pairs", q.q_minhash_pairs, None),
    )
    # Retired fixed-16x4 banding comparison rows — the corpus-realism
    # finding of the r13 zipf sweep; since r14 the DEFAULT derives the
    # banding from the threshold (see queries/documents.py doc), so
    # these twins keep the documented blowup measurable.
    specs.setdefault(
        "minhash_lsh_pairs_16x4",
        q.QuerySpec(
            "minhash_lsh_pairs_16x4", q.q_minhash_pairs_16x4, None
        ),
    )
    specs.setdefault(
        "near_dup_clusters_lsh",
        q.QuerySpec("near_dup_clusters_lsh", q.q_near_dup_clusters_lsh, None),
    )
    specs.setdefault(
        "cluster_representatives_lsh",
        q.QuerySpec(
            "cluster_representatives_lsh",
            q.q_cluster_representatives_lsh,
            None,
        ),
    )
    specs.setdefault(
        "near_dup_clusters_lsh_16x4",
        q.QuerySpec(
            "near_dup_clusters_lsh_16x4",
            q.q_near_dup_clusters_lsh_16x4,
            None,
        ),
    )
    # Production-grain (n=50, Lee et al.) twin of substring_dedup_docs;
    # bench-only, no oracle (see queries/documents.py).
    specs.setdefault(
        "substring_dedup_n50",
        q.QuerySpec("substring_dedup_n50", q.q_substring_dedup_n50, None),
    )
    for _ann in ("knn_ivf_search", "knn_pq_search"):
        specs.setdefault(
            _ann, q.QuerySpec(_ann, getattr(q, f"q_{_ann}"), None)
        )
    # The funnel's video leg (bench-only; the funnel query carries the
    # oracle proof of the same machinery — queries/media.py).
    specs.setdefault(
        "video_frame_dedup_pairs",
        q.QuerySpec(
            "video_frame_dedup_pairs", q.q_video_frame_dedup_pairs, None
        ),
    )
    return specs


def _gc_millis(spark) -> int:
    """Cumulative JVM GC time (ms) across all collectors — in local
    mode the driver JVM is the executor JVM, so per-rep deltas of this
    counter attribute a slow rep to GC pressure vs plan/compute (the
    r13 bucketed-graph x100 bimodality investigation)."""
    try:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(b.getCollectionTime() for b in beans)
    except Exception:  # noqa: BLE001 — diagnostics must never fail a cell
        return -1


def sweep(
    spark,
    datasets: list[tuple[str, str]],
    queries: list[str],
    specs: dict,
    out_path: str,
    reps: int,
    only_sets: set[str] = frozenset(),
    skip: dict[str, set[str]] | None = None,
) -> dict:
    """The timed loop: resumable (re-runs merge into an existing
    out.json), GC-paced (see the inline note), failure-isolated
    (a red cell records None and the sweep continues). ``skip`` maps a
    dataset label to query names excluded on that dataset (the
    isolation protocol)."""
    skip = skip or {}
    results: dict[str, dict[str, float]] = {}
    if Path(out_path).exists():
        results = json.loads(Path(out_path).read_text())
    for label, sf_dir in datasets:
        if not Path(sf_dir).exists() or (only_sets and label not in only_sets):
            print(f"skip {label}", file=sys.stderr)
            continue
        # Pre-build ANN indexes outside the timed region.
        for warm in WARM_QUERIES:
            if warm in queries and warm not in skip.get(label, ()) and not isinstance(
                results.get(warm, {}).get(label), float
            ):
                # Failure-isolated like bench.py's _warm: an OOM'd
                # index build (the documented 8g-at-x100 failure) must
                # red-flag THAT query, not abort the whole sweep.
                try:
                    specs[warm].spark(spark, sf_dir).limit(1).collect()
                except Exception as exc:  # noqa: BLE001
                    print(
                        f"{label} {warm}: WARMUP FAILED {exc!r}"[:500],
                        flush=True,
                    )
                    results.setdefault(warm, {})[label] = None
                    Path(out_path).write_text(
                        json.dumps(results, indent=1) + "\n"
                    )
        for name in queries:
            if name in skip.get(label, ()):
                print(f"{label} {name}: isolated (child process)")
                continue
            if isinstance(results.get(name, {}).get(label), float):
                print(f"{label} {name}: kept {results[name][label]}")
                continue
            if name in results and results[name].get(label, 0.0) is None:
                # The warm-up already failed for this (query, dataset)
                # and recorded None; re-running here would either pay a
                # deterministic failure twice or — worse — record a
                # median that silently INCLUDES the one-time
                # index/layout build the warm-up exists to exclude.
                print(f"{label} {name}: skipped (warm-up failed)")
                continue
            # Drive ContextCleaner NOW (paired with the session's
            # 5min periodicGC safety net): a full driver GC enqueues
            # the weak refs of the previous query's dropped
            # localCheckpoint RDDs, so their blocks are unpersisted
            # before — not during — the next timed region. This is
            # exactly what a well-behaved long-running service does
            # between requests; without it the x100 leg OOM'd a 48g
            # heap on superseded blocks after 13 queries. DOUBLE-TAP
            # with drain pauses (r12): one gc only ENQUEUES the weak
            # refs — the cleaner's unpersists run async, and the next
            # query's allocations raced them (the x100 text leg's
            # vocab/bigram checkpoints total tens of GB; pagerank
            # OOM'd twice while they were still draining). The pause
            # lets the cleaner issue the removeBlock calls; the second
            # gc reclaims the freed regions before timing starts.
            spark._jvm.System.gc()
            time.sleep(2)
            spark._jvm.System.gc()
            time.sleep(1)
            samples = []
            try:
                for rep in range(reps):
                    g0 = _gc_millis(spark)
                    t0 = time.perf_counter()
                    specs[name].spark(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
                    # Per-rep evidence line (stderr → the percell
                    # children.log): wall + GC delta, so a bimodal
                    # cell's slow mode is attributable after the fact.
                    print(
                        f"{label} {name} rep{rep}: "
                        f"{samples[-1]:.2f}s gc={_gc_millis(spark) - g0}ms",
                        file=sys.stderr,
                        flush=True,
                    )
                    # Between-rep cleanup must be the SAME double-tap
                    # + drain protocol as the pre-cell one: the r14
                    # rep-level evidence showed a single gc+1s leaves
                    # the previous execution's checkpoint blocks
                    # undrained at x100 state sizes, and the next rep
                    # lands in a storage-full eviction/GC mode 3-13x
                    # slower (e.g. skx100 near_dup_clusters_lsh 20.3s
                    # -> 271s with 49s of GC).
                    spark._jvm.System.gc()
                    time.sleep(2)
                    # Between-rep cleanup (outside the timed region):
                    # each rep rebuilds the query's localCheckpoints —
                    # for the graph queries that is an ~edge-set-sized
                    # block set PER REP, and two undrained sets plus a
                    # predecessor query's leftovers OOM'd the 48 g
                    # heap at x100 even though each rep alone fits.
                    spark._jvm.System.gc()
                    time.sleep(1)
            except Exception as exc:  # record and keep sweeping
                print(f"{label} {name}: FAILED {exc!r}"[:500], flush=True)
                results.setdefault(name, {})[label] = None
                continue
            samples.sort()
            results.setdefault(name, {})[label] = round(
                samples[len(samples) // 2], 2
            )
            print(f"{label} {name}: {results[name][label]}", flush=True)
            Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    return results


def warm_on(spark, specs: dict, queries: list[str], warm_dir: str) -> None:
    """One UNTIMED evaluation of each query against ``warm_dir`` — the
    dataset the cell will be TIMED on (the per-cell protocol passes the
    target SF, not a smaller one: a first pass over the real data
    volume is what drives C2 through the query's hot loops, and an x1
    warm left the many-small-stage graph cells 3-4x inflated at x100 —
    see ``percell_loop``). Warms JIT / whole-stage-codegen / the Arrow
    and Python worker paths the query touches, so a fresh-JVM child's
    first timed rep is not a cold-compile sample. Failure-tolerated — a
    query that cannot run at the warm SF still gets timed (its first
    rep is just colder)."""
    for name in queries:
        try:
            specs[name].spark(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"warm {name}: FAILED {exc!r}"[:300], file=sys.stderr)


def percell_loop(
    script: str,
    datasets: list[tuple[str, str]],
    queries: list[str],
    out_path: str,
    only_sets: set[str] = frozenset(),
    retry_failed: bool = False,
) -> dict:
    """Parent side of ``--percell``: one child process per pending
    (query, dataset) cell, merged into ``out_path`` via the resume
    protocol. The parent never creates a SparkSession, so no state
    outlives a cell. Children timing an x100-grade dataset get the
    ISOLATE_MEM heap (default 64g); everything else runs on
    SPARK_DRIVER_MEMORY (default 48g).

    Each child warms by executing ITS query once untimed at the
    TARGET dataset (not a smaller one): a first pass over the real
    data volume is what drives the C2 compiler through the query's
    hot loops — a cheap x1 warm pass left the many-small-stage graph
    cells 3-4x inflated at x100 (pagerank_3iter_bucketed 77 s with an
    x1 warm vs ~21 s steady-state; same C2-ramp mechanism bench.py's
    ramp protocol documents for kcore). The timed reps are therefore
    steady-state marginal cost — what a long-running service pays per
    query — at one extra untimed execution per cell.

    Failure protocol: a cell whose child exits non-zero without
    recording a value is written as ``null`` and SKIPPED on re-runs
    (so resumes don't retry a hard failure forever); pass
    ``retry_failed`` (``--retry-failed``) to clear the nulls and
    re-attempt them. Child stderr streams to ``<out_path>.children.log``
    so the failure cause survives the run."""
    base_mem = os.environ.get("SPARK_DRIVER_MEMORY", "48g")
    big_mem = os.environ.get("SPARK_GRAFT_SCALED_ISOLATE_MEM", "64g")
    log_path = Path(f"{out_path}.children.log")
    if retry_failed and Path(out_path).exists():
        results = json.loads(Path(out_path).read_text())
        cleared = [
            (n, lb)
            for n, row in results.items()
            for lb, v in list(row.items())
            if v is None
        ]
        for n, lb in cleared:
            del results[n][lb]
        if cleared:
            Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
            print(f"--retry-failed: cleared {len(cleared)} null cells")
    for label, sf_dir in datasets:
        if not Path(sf_dir).exists() or (only_sets and label not in only_sets):
            print(f"skip {label}", file=sys.stderr)
            continue
        for name in queries:
            results = (
                json.loads(Path(out_path).read_text())
                if Path(out_path).exists()
                else {}
            )
            if isinstance(results.get(name, {}).get(label), float):
                print(f"{label} {name}: kept {results[name][label]}")
                continue
            if label in results.get(name, {}):
                # Recorded null = a child already failed hard on this
                # cell; don't re-spawn (and re-pay the untimed warm
                # execution of a failing query) on every resume.
                print(
                    f"{label} {name}: skipped (failed earlier — "
                    f"--retry-failed to re-attempt)"
                )
                continue
            env = dict(
                os.environ,
                SPARK_GRAFT_SCALED_QUERIES=name,
                SPARK_GRAFT_SCALED_SETS=label,
                SPARK_GRAFT_SCALED_ISOLATE="",
                SPARK_GRAFT_SCALED_WARM_DIR=sf_dir,
                # Children must never run the growth gate themselves:
                # an inherited SPARK_GRAFT_SCALED_CHECK=1 would make
                # every child re-check the PARTIALLY-filled out.json
                # and exit 1 on any tripped budget, conflating gate
                # trips with real cell failures.
                SPARK_GRAFT_SCALED_CHECK="",
                # Every x100-grade cell gets the big heap: children
                # run alone, so the heaps never coexist, and the r13
                # protocol-validation runs showed several x100 cells
                # (bucketed graph, star_join, q21) bimodal between
                # 48g (GC-bound, 2-6x slower) and 64g (steady) — a
                # per-query list would chase that set forever.
                SPARK_DRIVER_MEMORY=(
                    big_mem if label.endswith("x100") else base_mem
                ),
            )
            with log_path.open("ab") as log:
                log.write(f"==== {label} {name} ====\n".encode())
                log.flush()
                rc = subprocess.call(
                    [sys.executable, script, out_path],
                    env=env,
                    stdout=subprocess.DEVNULL,
                    stderr=log,
                )
            results = (
                json.loads(Path(out_path).read_text())
                if Path(out_path).exists()
                else {}
            )
            got = results.get(name, {}).get(label)
            print(f"{label} {name}: {got} (child rc={rc})", flush=True)
            if rc != 0 and got is None:
                # Record the failure so re-runs don't retry forever.
                results.setdefault(name, {})[label] = None
                Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    return (
        json.loads(Path(out_path).read_text())
        if Path(out_path).exists()
        else {}
    )


def print_table(
    results: dict,
    datasets: list[tuple[str, str]],
    queries: list[str],
    lo: str = "x10",
    hi: str = "x100",
) -> None:
    """Markdown table for SCALING.md."""
    labels = [lb for lb, d in datasets if Path(d).exists()]
    print(f"\n| query | " + " | ".join(labels) + f" | {lo}→{hi} × |")
    print("|---|" + "---|" * (len(labels) + 1))
    for name in queries:
        row = results.get(name, {})
        vals = [
            f"{row[lb]:.2f}" if isinstance(row.get(lb), float) else "—"
            for lb in labels
        ]
        growth = (
            f"{row[hi] / row[lo]:.1f}×"
            if row.get(lo) and row.get(hi)
            else "—"
        )
        print(f"| {name} | " + " | ".join(vals) + f" | {growth} |")


def parse_cli(default_out: str, description: str):
    """Shared CLI for the sweep scripts. argparse, not a hand-rolled
    token loop: the old loop treated ANY unrecognized token as the
    output path, so ``--help`` started a multi-hour sweep that wrote
    its JSON to a file literally named ``--help``."""
    import argparse

    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "out_path",
        nargs="?",
        default=default_out,
        help=f"result JSON (resumable; default {default_out})",
    )
    p.add_argument(
        "--check",
        action="store_true",
        help="gate growth ratios against tools/scale_budgets.json",
    )
    p.add_argument(
        "--percell",
        action="store_true",
        help="one fresh child JVM per (query, dataset) cell",
    )
    p.add_argument(
        "--retry-failed",
        action="store_true",
        help="clear cells recorded as null (failed child) and re-attempt",
    )
    args = p.parse_args()
    if args.out_path.startswith("-"):
        p.error(f"output path looks like a flag: {args.out_path!r}")
    return args


def main() -> None:
    cli = parse_cli(
        "/tmp/bench_scaled.json",
        "Replica-corpus x1/x10/x100 scale sweep (SCALING.md grid)",
    )
    check = cli.check or os.environ.get("SPARK_GRAFT_SCALED_CHECK") == "1"
    percell = cli.percell
    out_path = cli.out_path
    # Median-of-3 (r14): with worse-of-2, one slow-mode rep (the
    # storage-pressure bimodality the rep evidence lines document)
    # polluted the recorded cell with probability 1-(1-p)^2; the
    # true median of 3 reps records the typical mode while the
    # children.log keeps the outlier visible.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # Resumable: re-runs merge into an existing out.json, and
    # SPARK_GRAFT_SCALED_SETS=x100 (comma list) restricts the datasets
    # — so a failed leg can be retried without re-timing x1/x10.
    # NOTE on memory: the x100 corpus (60M lineitem, 500k embeddings)
    # needs ~1.5 GiB of unified memory per local[32] thread for the
    # heaviest headliners; the 8g default that fits the driver SFs
    # dies in UNABLE_TO_ACQUIRE_MEMORY during the ANN index builds.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_SCALED_SETS", "").split(",") if s
    }
    # SPARK_GRAFT_SCALED_QUERIES=name1,name2 restricts the sweep to a
    # subset (and skips warm-ups the subset doesn't need) — for adding
    # one new query's rows to an existing out.json without re-warming
    # every ANN index at x100.
    only_q = {
        s
        for s in os.environ.get("SPARK_GRAFT_SCALED_QUERIES", "").split(",")
        if s
    }
    queries = [n for n in QUERIES if not only_q or n in only_q]
    isolate = {
        s
        for s in os.environ.get(
            "SPARK_GRAFT_SCALED_ISOLATE", DEFAULT_ISOLATE
        ).split(",")
        if s
    } & set(queries)
    x100_dir = dict(DATASETS).get("x100", "")
    isolation_active = bool(
        isolate
        and Path(x100_dir).exists()
        and (not only or "x100" in only)
    )

    if percell:
        results = percell_loop(
            __file__, DATASETS, queries, out_path, only_sets=only,
            retry_failed=cli.retry_failed,
        )
        print_table(results, DATASETS, queries)
        if check:
            violations = check_growth(results)
            for v in violations:
                print(f"SCALE-GATE VIOLATION: {v}")
            if violations:
                sys.exit(1)
            print("SCALE-GATE: all growth budgets held")
        return

    spark = get_spark(app_name="fdpo-bench-scaled")
    specs = build_specs(queries)
    # Spin up the Python worker pool once (startup, not query cost).
    spark.range(1024).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()
    warm_dir = os.environ.get("SPARK_GRAFT_SCALED_WARM_DIR")
    if warm_dir:
        warm_on(spark, specs, queries, warm_dir)

    results = sweep(
        spark,
        DATASETS,
        queries,
        specs,
        out_path,
        reps,
        only_sets=only,
        skip={"x100": isolate} if isolation_active else None,
    )

    if isolation_active:
        pending = sorted(
            n
            for n in isolate
            if not isinstance(results.get(n, {}).get("x100"), float)
        )
        if pending:
            # Own child process, own (bigger) heap; the parent session
            # stops FIRST so the two heaps never coexist (one-pass
            # protocol, module doc).
            spark.stop()
            env = dict(
                os.environ,
                SPARK_GRAFT_SCALED_QUERIES=",".join(pending),
                SPARK_GRAFT_SCALED_SETS="x100",
                SPARK_GRAFT_SCALED_ISOLATE="",
                SPARK_GRAFT_SCALED_CHECK="",  # gate runs in the parent
                SPARK_DRIVER_MEMORY=os.environ.get(
                    "SPARK_GRAFT_SCALED_ISOLATE_MEM", "64g"
                ),
            )
            print(
                f"isolated x100 leg: {pending} on "
                f"{env['SPARK_DRIVER_MEMORY']}",
                flush=True,
            )
            rc = subprocess.call(
                [sys.executable, __file__, out_path], env=env
            )
            if rc != 0:
                print(f"isolated leg FAILED rc={rc}", flush=True)
                sys.exit(rc)
            results = json.loads(Path(out_path).read_text())

    print_table(results, DATASETS, queries)

    if check:
        violations = check_growth(results)
        for v in violations:
            print(f"SCALE-GATE VIOLATION: {v}")
        if violations:
            sys.exit(1)
        print("SCALE-GATE: all growth budgets held")


if __name__ == "__main__":
    main()
