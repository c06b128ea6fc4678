"""Fresh-process driver-contract smoke: the r10 bug class.

The round-10 regression (LOCATION_ALREADY_EXISTS on the bucketed edge
table) was invisible to the shared-session pytest suite by
construction: it only fired in a FRESH session finding another
session's leftover warehouse files. This test runs the driver's
actual first moves — import ``__spark_entry__``, build a bucketed
query, collect — in two SEQUENTIAL subprocesses sharing one CWD, so
whatever state process 1 leaves behind, process 2 must survive.

Round 12 tightens the contract from "survive" to "reuse": process 2
must ADOPT process 1's stamped edge table (trust-but-verify via the
sidecar manifest, sources/bucketing.py) instead of rebuilding it — the
warehouse file listing (names, sizes, mtimes) must be bit-identical
across the two runs. ~2 min of JVM startup; it buys the only coverage
that would have caught r10 before the driver did.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from .conftest import SF_SMOKE

REPO = Path(__file__).resolve().parents[1]

_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from financial_data_pipeline_optimization_spark import get_spark
spark = get_spark(app_name="fresh-contract-{tag}")
qs = e.queries()
sf = {sf!r}
n1 = len(qs["pagerank_3iter_bucketed"](spark, sf).collect())
n2 = len(qs["kcore_trade_graph_bucketed"](spark, sf).collect())
assert n1 == 15, n1
print("FRESH_OK", n1, n2)
spark.stop()
"""


def _run(tag: str) -> str:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            _SNIPPET.format(repo=str(REPO), tag=tag, sf=SF_SMOKE),
        ],
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "FRESH_OK" in out.stdout
    return out.stdout


def _edge_table_snapshot() -> dict[str, tuple[int, float]]:
    """(size, mtime) per file under every pr_edges_by_src_* warehouse
    dir — the no-rewrite witness. Any rebuild rewrites every part file
    (new names AND new mtimes), so equality means process 2 adopted
    the layout without touching a byte."""
    snap = {}
    for d in (REPO / "spark-warehouse").glob("pr_edges_by_src_*"):
        for f in sorted(d.rglob("*")):
            if f.is_file():
                st = f.stat()
                snap[str(f.relative_to(REPO))] = (st.st_size, st.st_mtime)
    return snap


def test_bucketed_queries_survive_back_to_back_fresh_sessions():
    _run("one")
    before = _edge_table_snapshot()
    assert before, "process 1 left no bucketed edge table to adopt"
    # Process 2 is the r10 crash scenario: a brand-new in-memory
    # catalog, process 1's managed-table files still on disk. With the
    # trust stamp it must not only survive but reuse the table —
    # zero write jobs, identical file listing.
    _run("two")
    after = _edge_table_snapshot()
    assert after == before, (
        "process 2 rewrote the stamped edge table instead of "
        "adopting it",
        sorted(set(before) ^ set(after))[:10],
    )


_QUALIFIED_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from financial_data_pipeline_optimization_spark import get_spark
from financial_data_pipeline_optimization_spark.sources.bucketing import (
    trust_bucketed_table, write_bucketed_table,
)
spark = get_spark(app_name="fresh-qualified-{tag}")
stamp = {{"fdpo.source.fingerprint": "fresh-qdb-1"}}
name = "fdpo_freshdb.fresh_probe"
if not trust_bucketed_table(spark, name, stamp):
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    write_bucketed_table(df, name, ["k"], 4, properties=stamp)
    print("QUALIFIED_BUILT")
else:
    print("QUALIFIED_ADOPTED")
print("QUALIFIED_OK", spark.table(name).count())
spark.stop()
"""


def _qualified_snapshot() -> dict[str, tuple[int, float]]:
    snap = {}
    d = REPO / "spark-warehouse" / "fdpo_freshdb.db" / "fresh_probe"
    for f in sorted(d.rglob("*")):
        if f.is_file():
            st = f.stat()
            snap[str(f.relative_to(REPO))] = (st.st_size, st.st_mtime)
    return snap


def _run_qualified(tag: str) -> str:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            _QUALIFIED_SNIPPET.format(repo=str(REPO), tag=tag),
        ],
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "QUALIFIED_OK 500" in out.stdout
    return out.stdout


def test_db_qualified_bucketed_table_adopted_across_fresh_sessions():
    """r13: the cross-session adoption contract extends to
    db-qualified names — process 1 builds a stamped managed table in a
    non-default database, process 2 (fresh in-memory catalog, which
    has forgotten both the database AND the table) must trust-adopt it
    byte-identically instead of rebuilding."""
    import shutil

    shutil.rmtree(
        REPO / "spark-warehouse" / "fdpo_freshdb.db", ignore_errors=True
    )
    one = _run_qualified("one")
    assert "QUALIFIED_BUILT" in one
    before = _qualified_snapshot()
    assert before, "process 1 left no qualified table to adopt"
    two = _run_qualified("two")
    assert "QUALIFIED_ADOPTED" in two
    assert _qualified_snapshot() == before, (
        "process 2 rewrote the stamped db-qualified table instead of "
        "adopting it"
    )
