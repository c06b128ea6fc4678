"""Driver-style oracle verification (the /verify skill's step 2 as a
reusable harness): run `__spark_entry__.queries()[name]` on Spark and
`oracle_sql()[name]` on DuckDB over the same parquet tables, normalize
(columns sorted by name, floats rounded, rows sorted) and compare.

Usage:
    python tools/verify_oracle.py name1 name2 ...   # specific queries
    python tools/verify_oracle.py --all             # every paired query
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01        # table dir override

Exit code 0 iff every requested query matches (rows-only queries — no
oracle entry — are checked for non-erroring execution and schema
stability only, mirroring the driver's weaker check).
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from financial_data_pipeline_optimization_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    queries, oracles = e.queries(), e.oracle_sql()
    if "--all" in sys.argv or not names:
        names = sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="fdpo-verify")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001 — report, keep going
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            rel = duck.execute(oracles[name])
            d_cols = [c[0] for c in rel.description]
            d_rows = [tuple(r) for r in rel.fetchall()]
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            continue
        sc, sr = _norm_rows(s_cols, s_rows)
        dc, dr = _norm_rows(d_cols, d_rows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: schema {sc} vs oracle {dc}")
        elif len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL {name}: {len(sr)} rows vs oracle {len(dr)}")
        elif sr != dr:
            failures.append(name)
            bad = next(i for i in range(len(sr)) if sr[i] != dr[i])
            print(
                f"FAIL {name}: value mismatch at sorted row {bad}:\n"
                f"  spark : {sr[bad]}\n  oracle: {dr[bad]}"
            )
        else:
            print(f"PASS {name}: {len(sr)} rows match")
    print(
        f"RESULT {len(names) - len(failures)}/{len(names)} green"
        + (f"; failures: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
