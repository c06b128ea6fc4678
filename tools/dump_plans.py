"""Dump ``explain("formatted")`` for named registry queries to files.

The optimization-round deliverable: ``plans/r{N}/<query>_{before,after}.txt``
holds the committed physical plan of every query an optimization round
touched, so a reviewer without a Spark runtime can check plan claims
(exchange counts, join strategies, pushed filters) against the code.

Usage (repo root; run once in the pre-change tree with ``before`` and
once in the post-change tree with ``after``)::

    python tools/dump_plans.py OUT_DIR SUFFIX QUERY [QUERY ...]

e.g.::

    python tools/dump_plans.py plans/r16 after near_dup_clusters oov_rate_top_vocab

Queries are resolved like bench.py resolves headliners: the registry
first, then the ``q_<name>`` bench-only shims in the queries package.
Plans are built at sf0.01 (same SF as the committed PLANS_r{N}.md
audit). Iterative queries execute their bounded plan-build actions
(probe / CC loop / k-means training) while the DataFrame is
constructed — expected, bounded, and identical to what the audit does.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

#: Dataset dir: same env var bench.py resolves (r17, ADVICE — the
#: hardcoded path silently broke on hosts with a different testdata
#: layout). The sf0.01 default matches the committed PLANS_r{N}.md
#: audit SF (deliberately NOT bench.py's sf0.1 default: plan SHAPE is
#: what this tool dumps, and sf0.01 builds it in seconds).
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)

    from financial_data_pipeline_optimization_spark import get_spark
    from financial_data_pipeline_optimization_spark import queries as q

    spark = get_spark(app_name=f"dump-plans-{suffix}")
    specs = {s.name: s.spark for s in q.registry()}
    for name in names:
        fn = specs.get(name) or getattr(q, f"q_{name}", None)
        if fn is None:
            sys.exit(f"unknown query: {name}")
        df = fn(spark, SF_DIR)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
