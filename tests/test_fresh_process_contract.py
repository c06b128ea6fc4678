"""Fresh-process driver-contract smoke: the r10 bug class.

The round-10 regression (LOCATION_ALREADY_EXISTS on the bucketed edge
table) was invisible to the shared-session pytest suite by
construction: it only fired in a FRESH session finding another
session's leftover warehouse files. This test runs the driver's
actual first moves — import ``__spark_entry__``, build a bucketed
query, collect — in two SEQUENTIAL subprocesses sharing one CWD, so
whatever state process 1 leaves behind, process 2 must survive.
~2 min of JVM startup; it buys the only coverage that would have
caught r10 before the driver did.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from financial_data_pipeline_optimization_spark import get_spark
spark = get_spark(app_name="fresh-contract-{tag}")
qs = e.queries()
sf = "/root/testdata/sf0.001"
n1 = len(qs["pagerank_3iter_bucketed"](spark, sf).collect())
n2 = len(qs["kcore_trade_graph_bucketed"](spark, sf).collect())
assert n1 == 15, n1
print("FRESH_OK", n1, n2)
spark.stop()
"""


def _run(tag: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET.format(repo=str(REPO), tag=tag)],
        cwd=str(REPO),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "FRESH_OK" in out.stdout
    return out.stdout


def test_bucketed_queries_survive_back_to_back_fresh_sessions():
    _run("one")
    # Process 2 is the r10 crash scenario: a brand-new in-memory
    # catalog, process 1's managed-table files still on disk.
    _run("two")
