"""Reusable fresh-JVM A/B harness (r16, VERDICT task #6 — the
generalization of ``tools/ab_q21.py``'s child machinery).

Measures plan variants × datasets under the scaled-sweep protocol the
r15 q21 A/B validated:

- ONE FRESH JVM PER CELL (a (variant, dataset) pair) — r13 measured
  up to 10× in-session inflation after ~230 timed runs in one JVM, so
  cross-variant comparisons inside a shared session are ordering-
  biased and invalid (see the A/B-protocol note in SCALING.md);
- one untimed warm run AT THE TARGET DATASET (C2 ramp — warming with
  a cheap ×1 pass leaves ×100 cells 3–4× inflated);
- median of ``SPARK_GRAFT_BENCH_REPS`` (default 3) timed noop-sink
  runs, every sample recorded;
- QUIET-HOST acceptance (the r15 scale-sweep protocol, now code):
  each cell waits for pre-run 1-min load below
  ``SPARK_GRAFT_AB_MAXLOAD`` (default 1.5; this host's external
  tenants have been observed at 1-min load 17+, inflating cells up to
  5×), and a during-run sampler records EXTERNAL busy cores — host
  CPU minus our own process tree, because raw loadavg is
  self-contaminated by the local[32] run itself — so a contaminated
  cell is VISIBLE in the artifact (``load_pre`` / ``load_max`` /
  ``ext_cores_max`` per cell, ``quiet`` = started quiet AND external
  cores stayed under the bound) instead of silently wrong;
- DNF containment: a timed-out or crashed cell records an ``err``
  entry, never aborts the sweep; results persist incrementally.

Variant specs are plain Python modules exposing::

    AB_VARIANTS: dict[str, Callable[[SparkSession, str], DataFrame]]
    AB_DATASETS: list[tuple[str, str]]   # (set_name, sf_dir)

(``tools/ab_q21.py`` exposes both, so the r15 q21 A/B reruns through
this tool verbatim: ``python tools/ab.py --spec tools/ab_q21.py``.)

Usage:
  python tools/ab.py --spec SPEC.py [out.json]       # orchestrate
  python tools/ab.py --cell SPEC.py VARIANT SET      # child mode
  python tools/ab.py --cell-query NAME SF_DIR        # one registry
        query, fresh JVM, quiet-gated — bench.py's cross-round drift
        re-measure calls this (prints one ``CELL {json}`` line).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

def _cell_timeout_s() -> int:
    return int(os.environ.get("SPARK_GRAFT_AB_TIMEOUT", "1800"))


def max_quiet_load() -> float:
    """The 1-min-load acceptance bound (env-dynamic so tests and
    orchestrators control children without re-importing)."""
    return float(os.environ.get("SPARK_GRAFT_AB_MAXLOAD", "1.5"))


def load_1min() -> float:
    """Current 1-minute load average (the external-tenant contention
    signal on this shared host)."""
    return os.getloadavg()[0]


def wait_for_quiet(
    max_load: float | None = None,
    timeout_s: float | None = None,
    poll_s: float = 10.0,
) -> tuple[float, bool]:
    """Block until the 1-min load drops below ``max_load`` (default
    $SPARK_GRAFT_AB_MAXLOAD, 1.5) or ``timeout_s`` (default
    $SPARK_GRAFT_AB_QUIET_WAIT, 600) elapses. Returns
    ``(load_at_accept, quiet)`` — ``quiet=False`` means the gate TIMED
    OUT and the caller is proceeding on a loud host (record it; don't
    trust the cell)."""
    if max_load is None:
        max_load = max_quiet_load()
    if timeout_s is None:
        timeout_s = float(
            os.environ.get("SPARK_GRAFT_AB_QUIET_WAIT", "600")
        )
    deadline = time.monotonic() + timeout_s
    load = load_1min()
    while load >= max_load and time.monotonic() < deadline:
        time.sleep(poll_s)
        load = load_1min()
    return load, load < max_load


def _external_proc_cpu(root_pid: int) -> dict[int, float]:
    """One /proc scan → per-pid cumulative CPU seconds (utime+stime)
    of every LIVE USERLAND process OUTSIDE ``root_pid``'s tree.

    This is the DIRECT external-load metric, and it is direct for a
    measured reason. Three inference-by-subtraction designs (host
    busy minus own tree) each produced phantom external load: a naive
    tree sum lost an exiting child JVM's cumulative history (false 25
    cores); per-pid own accounting still couldn't attribute a
    vanished worker's final interval (false ~5.8 cores); and even
    with kernel threads excluded, context-switch-heavy streaming
    leaves ~3.9 cores/s of kernel tick time attributed to NO process
    (diagnosed live: /proc/stat busy 14.3 vs own-tree 10.3 + kthread
    0.2 with ZERO external processes running). Summing the CPU that
    external processes THEMSELVES report cannot see phantoms: the
    tenant waves on this host are in-VM processes (they appear in
    this VM's loadavg and /proc), so what they burn is exactly what
    this returns. Kernel threads (pid 2's children) are excluded —
    their work is induced by the busiest tenant, usually us during a
    bench."""
    stats: dict[int, tuple[int, float]] = {}  # pid -> (ppid, cpu_s)
    tck = os.sysconf("SC_CLK_TCK")
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                raw = f.read()
        except OSError:
            continue  # raced with process exit
        # comm may contain spaces/parens: split after the LAST ')'.
        rest = raw.rsplit(")", 1)[-1].split()
        # rest[0]=state rest[1]=ppid ... rest[11]=utime rest[12]=stime
        try:
            stats[int(entry)] = (
                int(rest[1]),
                (int(rest[11]) + int(rest[12])) / tck,
            )
        except (IndexError, ValueError):
            continue
    frontier = {root_pid}
    members: set[int] = set()
    while frontier:
        members |= frontier
        frontier = {
            pid
            for pid, (ppid, _) in stats.items()
            if ppid in members and pid not in members
        }
    kthreads = {2} | {
        pid for pid, (ppid, _) in stats.items() if ppid == 2
    }
    return {
        pid: cpu
        for pid, (ppid, cpu) in stats.items()
        if pid not in members and pid not in kthreads
    }


def _steal_ticks() -> float:
    """Cumulative hypervisor steal seconds from ``/proc/stat`` (field 8
    of the aggregate cpu line). Steal is CPU this VM's runnable tasks
    WANTED but the hypervisor gave to a co-tenant VM — contention the
    in-VM process scan can never see (no process in this VM burns it).
    Returns 0.0 where the field is absent (bare metal)."""
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
        return int(fields[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return 0.0


class LoadSampler:
    """Background EXTERNAL-load sampler for the duration of a cell.

    The naive 1-min loadavg is self-contaminating here: a local[32]
    Spark run legitimately drives the load far past any quiet bound,
    so sampling raw loadavg during our own run flags every long cell
    as loud. What actually invalidates a cell is OTHER tenants' CPU,
    measured DIRECTLY on two channels:

    - IN-VM tenants: each poll sums the CPU that live userland
      processes OUTSIDE our own process tree burned over the interval
      (see :func:`_external_proc_cpu` for why inference by subtraction
      was abandoned — three designs, three measured phantom-load
      artifacts).
    - CO-TENANT VMs (r16, found by measurement): hypervisor STEAL
      ticks (:func:`_steal_ticks`). A full streaming re-measure on
      this host came back 2–4× slow on EVERY scenario — including
      JVM-only ones no code change touched — with ``ext_cores`` ~0.03
      and ``host_quiet: true``; /proc/stat showed ~9,300 cumulative
      steal seconds over a 94-minute uptime. Steal slows a cell
      uniformly while remaining invisible to any in-VM process scan,
      so it gets its own sampled channel and its own acceptance gate.

    ``stop()`` returns ``(load_max, ext_cores_max)`` — the raw loadavg
    max (context) and the max external-cores reading;
    ``self.ext_cores_mean`` and ``self.steal_cores_mean`` (set by
    stop) are the acceptance signals."""

    def __init__(self, poll_s: float = 5.0) -> None:
        self._poll = poll_s
        self._max_load = load_1min()
        self._max_ext = 0.0
        self._ext_sum = 0.0
        self._ext_n = 0
        self._max_steal = 0.0
        self._steal_sum = 0.0
        self._steal_n = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _sample_ext(self, prev: tuple[float, dict, float]):
        now = time.monotonic()
        ext_cpu = _external_proc_cpu(os.getpid())
        steal = _steal_ticks()
        dt = now - prev[0]
        if dt > 0.5:
            # Per-pid deltas; a NEW external pid's full cumulative
            # counts (born this interval); a vanished one's final
            # partial interval is lost — a bounded UNDERcount of
            # external load, the safe direction (a sustained wave is
            # caught by every interval it survives).
            burned = sum(
                max(0.0, cpu - prev[1].get(pid, 0.0))
                for pid, cpu in ext_cpu.items()
            )
            ext = burned / dt
            self._max_ext = max(self._max_ext, ext)
            self._ext_sum += ext
            self._ext_n += 1
            stolen = max(0.0, steal - prev[2]) / dt
            self._max_steal = max(self._max_steal, stolen)
            self._steal_sum += stolen
            self._steal_n += 1
        return (now, ext_cpu, steal)

    def _run(self) -> None:
        prev = (
            time.monotonic(),
            _external_proc_cpu(os.getpid()),
            _steal_ticks(),
        )
        while not self._stop.wait(self._poll):
            self._max_load = max(self._max_load, load_1min())
            prev = self._sample_ext(prev)

    def stop(self) -> tuple[float, float]:
        """Returns ``(load_max, ext_cores_max)``; also sets
        ``self.ext_cores_mean`` / ``self.steal_cores_mean`` (and
        ``.steal_cores_max``) — the SUSTAINED external and stolen
        load over clean intervals, which are the acceptance signals
        (a one-poll spike cannot bias a median-of-reps cell; a
        tenant wave that actually inflates numbers shows up in the
        mean)."""
        self._stop.set()
        self._t.join(timeout=2)
        self.ext_cores_mean = round(
            self._ext_sum / self._ext_n if self._ext_n else 0.0, 2
        )
        self.steal_cores_mean = round(
            self._steal_sum / self._steal_n if self._steal_n else 0.0,
            2,
        )
        self.steal_cores_max = round(self._max_steal, 2)
        return max(self._max_load, load_1min()), round(self._max_ext, 2)


class QuietSession:
    """Context manager bundling the r16 measurement protocol for the
    standalone bench harnesses (streaming/multimodal/skew re-base,
    VERDICT task #4): pre-run quiet gate, whole-run external-cores
    sampler, and a ``stamp()`` dict to merge into the artifact so
    every snapshot carries its own acceptance evidence::

        with QuietSession() as qs:
            ...measure...
        out.update(qs.stamp())   # protocol + load evidence
    """

    def __enter__(self) -> "QuietSession":
        self.load_pre, self.quiet = wait_for_quiet()
        self._sampler = LoadSampler()
        return self

    def __exit__(self, *exc) -> None:
        self.load_max, self.ext_cores_max = self._sampler.stop()
        self.ext_cores_mean = self._sampler.ext_cores_mean
        self.steal_cores_mean = self._sampler.steal_cores_mean
        self.steal_cores_max = self._sampler.steal_cores_max

    def stamp(self) -> dict:
        quiet = (
            self.quiet
            and self.ext_cores_mean < max_quiet_load()
            and self.steal_cores_mean < max_quiet_load()
        )
        return {
            "protocol": "r16-quiet-host",
            "load_pre": round(self.load_pre, 2),
            "load_max": round(self.load_max, 2),
            "ext_cores_max": self.ext_cores_max,
            "ext_cores_mean": self.ext_cores_mean,
            "steal_cores_max": self.steal_cores_max,
            "steal_cores_mean": self.steal_cores_mean,
            "host_quiet": quiet,
        }


def _load_spec(spec_path: str):
    spec_file = Path(spec_path).resolve()
    mod_spec = importlib.util.spec_from_file_location(
        spec_file.stem, spec_file
    )
    mod = importlib.util.module_from_spec(mod_spec)
    mod_spec.loader.exec_module(mod)
    variants = getattr(mod, "AB_VARIANTS")
    datasets = list(getattr(mod, "AB_DATASETS"))
    return variants, datasets


def measure_fn(fn, sf_dir: str, app_name: str) -> dict:
    """Warm + median-of-reps measurement of one (spark, sf_dir) ->
    DataFrame callable in THIS process (callers give it a fresh one).
    Returns the cell dict (median, samples, load_pre, load_max)."""
    from financial_data_pipeline_optimization_spark import get_spark

    load_pre, quiet = wait_for_quiet()
    spark = get_spark(app_name=app_name)
    sampler = LoadSampler()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    samples = []
    for _ in range(reps):
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - start)
    load_max, ext_max = sampler.stop()
    samples.sort()
    return {
        "median": round(samples[len(samples) // 2], 3),
        "samples": [round(s, 3) for s in samples],
        "load_pre": round(load_pre, 2),
        "load_max": round(load_max, 2),
        "ext_cores_max": ext_max,
        "ext_cores_mean": sampler.ext_cores_mean,
        "steal_cores_max": sampler.steal_cores_max,
        "steal_cores_mean": sampler.steal_cores_mean,
        # Acceptance: the host was quiet at start AND external
        # tenants' SUSTAINED burn stayed under the bound while we ran
        # (raw loadavg is self-contaminated by our own local[32] run;
        # the max is published as context but a one-poll spike can't
        # bias a median-of-reps cell) AND co-tenant VMs' sustained
        # hypervisor steal did too (invisible to the process scan).
        "quiet": quiet
        and sampler.ext_cores_mean < max_quiet_load()
        and sampler.steal_cores_mean < max_quiet_load(),
    }


def run_cell(spec_path: str, variant: str, set_name: str) -> None:
    variants, datasets = _load_spec(spec_path)
    sf_dir = dict(datasets)[set_name]
    cell = measure_fn(
        variants[variant], sf_dir, app_name=f"ab-{variant}-{set_name}"
    )
    cell.update({"variant": variant, "set": set_name})
    print("CELL " + json.dumps(cell), flush=True)


def run_cell_query(name: str, sf_dir: str) -> None:
    """Child mode for bench.py's drift re-measure: one bench headliner
    (the shipped plan, resolved exactly as the bench runs it —
    registry names AND bench-only shims like the knn twins), fresh
    JVM, quiet-gated."""
    import bench

    spec = bench.bench_specs()[name]
    cell = measure_fn(
        lambda spark, d: spec.spark(spark, d),
        sf_dir,
        app_name=f"ab-query-{name}",
    )
    cell.update({"query": name, "sf_dir": sf_dir})
    print("CELL " + json.dumps(cell), flush=True)


def spawn_cell(argv: list[str], timeout_s: int | None = None) -> dict:
    """Run one child cell; parse its CELL line; contain failures as
    ``err`` cells (a DNF must be recorded, never abort the sweep)."""
    if timeout_s is None:
        timeout_s = _cell_timeout_s()
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), *argv],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {"err": f"timeout >{timeout_s}s (DNF)", "rc": None}
    for line in proc.stdout.splitlines():
        if line.startswith("CELL "):
            return json.loads(line[5:])
    return {"err": proc.stderr[-500:], "rc": proc.returncode}


def orchestrate(spec_path: str, out_path: str) -> None:
    variants, datasets = _load_spec(spec_path)
    results: dict[str, dict[str, dict]] = {v: {} for v in variants}
    for set_name, sf_dir in datasets:
        if not Path(sf_dir).exists():
            print(f"skip {set_name}: {sf_dir} missing", flush=True)
            continue
        for variant in variants:
            cell = spawn_cell(["--cell", spec_path, variant, set_name])
            results[variant][set_name] = cell
            print(f"{variant}/{set_name}: {cell}", flush=True)
            Path(out_path).write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {out_path}")


def main() -> None:
    args = sys.argv[1:]
    if args[:1] == ["--cell"] and len(args) >= 4:
        run_cell(args[1], args[2], args[3])
    elif args[:1] == ["--cell-query"] and len(args) >= 3:
        run_cell_query(args[1], args[2])
    elif args[:1] == ["--spec"] and len(args) >= 2:
        out = args[2] if len(args) > 2 else "/tmp/ab.json"
        orchestrate(args[1], out)
    else:
        print(__doc__)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
