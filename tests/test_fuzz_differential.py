"""Differential query fuzzing: randomly composed filter / join /
group / aggregate queries executed by BOTH engines.

The oracle-parity suite checks fixed, hand-written query/SQL pairs;
this harness GENERATES the pair from one shared spec, so it explores
predicate/aggregate combinations nobody thought to write down —
null-handling, OR-distribution, type-width, and date-comparison
semantics divergences between Spark and DuckDB surface here first.
Hypothesis shrinks any failure to a minimal query spec.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_SMOKE

SET = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)


@pytest.fixture(scope="module", autouse=True)
def _bind(spark):
    global SPARK, DUCK
    SPARK = spark
    DUCK = duckdb.connect()
    for t in ("orders", "customer"):
        DUCK.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield
    DUCK.close()


#: (spark_column, sql_text) predicate pairs built from shared constants.
def _predicates():
    def price(th):
        return (
            F.col("o_totalprice") > th,
            f"o_totalprice > {th}",
        )

    def priority(p):
        return (
            F.col("o_orderpriority") == p,
            f"o_orderpriority = '{p}'",
        )

    def modk(k, r):
        return (
            F.col("o_custkey") % k == r,
            f"o_custkey % {k} = {r}",
        )

    def before(iso):
        return (
            F.col("o_orderdate") < F.lit(iso).cast("timestamp"),
            f"o_orderdate < TIMESTAMP '{iso}'",
        )

    return st.one_of(
        st.integers(0, 60).map(lambda i: price(i * 10000)),
        st.sampled_from(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ).map(priority),
        st.tuples(st.integers(2, 7), st.integers(0, 1)).map(
            lambda t: modk(t[0], t[1])
        ),
        st.sampled_from(
            ["1996-01-01", "1998-06-15", "2000-12-31"]
        ).map(before),
    )


GROUPS = st.sampled_from(
    [None, "o_orderstatus", "o_orderpriority", "c_mktsegment"]
)


@given(
    p1=_predicates(),
    p2=st.one_of(st.none(), _predicates()),
    conj=st.booleans(),
    group=GROUPS,
)
@SET
def test_generated_query_matches_duckdb(p1, p2, conj, group):
    sc1, sql1 = p1
    where_sql = sql1
    cond = sc1
    if p2 is not None:
        sc2, sql2 = p2
        op = "AND" if conj else "OR"
        where_sql = f"({sql1}) {op} ({sql2})"
        cond = (sc1 & sc2) if conj else (sc1 | sc2)

    odf = load_table(SPARK, SF_SMOKE, "orders")
    joined = group == "c_mktsegment"
    if joined:
        cdf = load_table(SPARK, SF_SMOKE, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        base = odf.join(
            F.broadcast(cdf),
            odf["o_custkey"] == cdf["c_custkey"],
        )
        from_sql = (
            "orders JOIN customer ON o_custkey = c_custkey"
        )
    else:
        base = odf
        from_sql = "orders"

    filtered = base.filter(cond)
    # Engine-portable cents rounding (Spark HALF_UP vs DuckDB
    # half-even — see queries._r2).
    rsum = F.floor(
        F.sum("o_totalprice") * 100 + F.lit(0.50005)
    ) / 100
    if group is None:
        sdf = filtered.agg(
            F.count(F.lit(1)).alias("n"),
            rsum.alias("s"),
            F.min("o_custkey").alias("mn"),
            F.max("o_custkey").alias("mx"),
        )
        sql = (
            "SELECT count(*) AS n, "
            "floor(sum(o_totalprice)*100 + 0.50005)/100 AS s, "
            "min(o_custkey) AS mn, max(o_custkey) AS mx "
            f"FROM {from_sql} WHERE {where_sql}"
        )
    else:
        sdf = (
            filtered.groupBy(group)
            .agg(
                F.count(F.lit(1)).alias("n"),
                rsum.alias("s"),
                F.min("o_custkey").alias("mn"),
                F.max("o_custkey").alias("mx"),
            )
            .orderBy(group)
        )
        sql = (
            f"SELECT {group}, count(*) AS n, "
            "floor(sum(o_totalprice)*100 + 0.50005)/100 AS s, "
            "min(o_custkey) AS mn, max(o_custkey) AS mx "
            f"FROM {from_sql} WHERE {where_sql} "
            f"GROUP BY {group} ORDER BY {group}"
        )

    got = [tuple(r) for r in sdf.collect()]
    want = DUCK.execute(sql).fetchall()
    assert len(got) == len(want), (sql, got, want)
    for gr, wr in zip(got, want):
        for a, b in zip(gr, wr):
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None:
                    assert a is None and b is None, (sql, gr, wr)
                else:
                    assert math.isclose(
                        float(a), float(b), rel_tol=1e-9, abs_tol=1e-6
                    ), (sql, gr, wr)
            else:
                assert a == b, (sql, gr, wr)


@given(
    part=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    k=st.integers(1, 5),
    use_lag=st.booleans(),
    p1=_predicates(),
)
@SET
def test_generated_window_query_matches_duckdb(part, k, use_lag, p1):
    """Window-function differential: top-k per partition by price with
    a unique-key tiebreak, optionally with lag deltas — ranking-tie
    and frame semantics are where engines classically diverge."""
    from pyspark.sql import Window

    sc1, sql1 = p1
    odf = load_table(SPARK, SF_SMOKE, "orders").filter(sc1)
    w = Window.partitionBy(part).orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    sdf = odf.select(
        part,
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.floor(
            (
                F.col("o_totalprice")
                - F.coalesce(
                    F.lag("o_totalprice").over(w), F.lit(0.0)
                )
            )
            * 100
            + F.lit(0.50005)
        ).alias("d_cents")
        if use_lag
        else F.lit(0).alias("d_cents"),
    ).filter(F.col("rn") <= k)
    lag_sql = (
        "CAST(floor((o_totalprice - coalesce(lag(o_totalprice) OVER "
        f"(PARTITION BY {part} ORDER BY o_totalprice DESC, o_orderkey), "
        "0.0)) * 100 + 0.50005) AS BIGINT)"
        if use_lag
        else "CAST(0 AS BIGINT)"
    )
    sql = f"""
    SELECT {part}, o_orderkey, rn, d_cents FROM (
      SELECT {part}, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY {part}
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
               AS rn,
             {lag_sql} AS d_cents
      FROM orders WHERE {sql1}
    ) WHERE rn <= {k}
    """
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in DUCK.execute(sql).fetchall())
    assert got == want, (sql, got[:3], want[:3])


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_categories=("Cs",),
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_tokenizer_contract_matches_duckdb(texts):
    """The shared tokenizer twin (operators.text.tokens vs the oracle's
    string_split_regex expression) underpins ~20 text queries — fuzz it
    with arbitrary unicode, whitespace runs, emoji, empty strings. Any
    regex-dialect divergence between Spark's and DuckDB's engines
    breaks every downstream token count/shingle/LM-score pair, so it
    must surface HERE, shrunk to a minimal string."""
    import pandas as pd

    from financial_data_pipeline_optimization_spark.operators.text import tokens

    sdf = SPARK.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["t"])
        for r in sdf.select("doc_id", tokens("text").alias("t")).collect()
    }
    fuzz_docs = pd.DataFrame(  # noqa: F841 — DuckDB reads it by name
        {"doc_id": range(len(texts)), "text": texts}
    )
    from financial_data_pipeline_optimization_spark import queries as q

    want = {
        r[0]: list(r[1])
        for r in DUCK.execute(
            f"SELECT doc_id, {q._ORACLE_TOKENS} FROM fuzz_docs"
        ).fetchall()
    }
    assert got == want, {
        k: (got[k], want[k]) for k in got if got[k] != want[k]
    }


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(1, 5),
)
@SET
def test_shingle_contract_matches_duckdb(texts, n):
    """The shingle twin (operators.dedup.with_shingles vs the oracle's
    slice/array_to_string expression) underpins every near-dup /
    decontamination / novelty pair. Fuzz the slice edge cases — docs
    shorter than n, empty strings, unicode — comparing the DISTINCT
    shingle SET (order is engine-specific, membership is the
    contract)."""
    import pandas as pd

    from financial_data_pipeline_optimization_spark.operators.dedup import (
        with_shingles,
    )
    from financial_data_pipeline_optimization_spark import queries as q

    sdf = SPARK.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in with_shingles(sdf, "text", n=n, out_col="sh").collect()
    }
    fuzz_docs = pd.DataFrame(  # noqa: F841 — DuckDB reads it by name
        {"doc_id": range(len(texts)), "text": texts}
    )
    want = {
        r[0]: sorted(r[1])
        for r in DUCK.execute(
            f"""
            SELECT doc_id,
                   list_distinct(list_transform(
                     range(greatest(len(tk) - {n - 1}, 1)),
                     i -> array_to_string(tk[i+1:i+{n}], ' ')))
            FROM (SELECT doc_id, {q._ORACLE_TOKENS} AS tk FROM fuzz_docs)
            """
        ).fetchall()
    }
    assert got == want, {
        k: (got[k], want[k]) for k in got if got[k] != want[k]
    }


@given(
    dates=st.lists(
        st.dates(
            min_value=__import__("datetime").date(1900, 1, 1),
            max_value=__import__("datetime").date(2100, 12, 28),
        ),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(-40, 40),
)
@SET
def test_calendar_derivations_match_duckdb(dates, k):
    """Calendar-derivation twins (F1-F5 + date arithmetic): weekday
    numbering, ISO weeks, month-end clamping of add_months, and
    week-truncation are classic engine-divergence spots; fuzz them on
    arbitrary dates (leap days, century boundaries) so any drift
    shrinks to one date instead of surfacing as a far-downstream
    aggregate mismatch."""
    import pandas as pd

    sdf = SPARK.createDataFrame(
        [(i, d) for i, d in enumerate(dates)], "i long, d date"
    )
    c = F.col("d")
    got = {
        r["i"]: tuple(r)[2:]
        for r in sdf.select(
            "i",
            "d",
            F.year(c),
            F.quarter(c),
            F.month(c),
            F.dayofmonth(c),
            F.dayofweek(c),
            F.weekofyear(c),
            F.dayofyear(c),
            F.last_day(c),
            F.date_trunc("week", c).cast("date"),
            F.add_months(c, k),
            F.date_add(c, k),
            F.date_format(c, "EEEE"),
        ).collect()
    }
    fuzz_dates = pd.DataFrame(  # noqa: F841 — DuckDB reads it by name
        {"i": range(len(dates)), "d": dates}
    )
    want = {
        r[0]: tuple(r)[1:]
        for r in DUCK.execute(
            f"""
            SELECT i,
                   CAST(year(d) AS INT),
                   CAST(quarter(d) AS INT),
                   CAST(month(d) AS INT),
                   CAST(dayofmonth(d) AS INT),
                   CAST(dayofweek(d) + 1 AS INT),
                   CAST(weekofyear(d) AS INT),
                   CAST(dayofyear(d) AS INT),
                   last_day(d),
                   CAST(date_trunc('week', d) AS DATE),
                   CAST(d + ({k} * INTERVAL 1 MONTH) AS DATE),
                   CAST(d + ({k} * INTERVAL 1 DAY) AS DATE),
                   dayname(d)
            FROM fuzz_dates
            """
        ).fetchall()
    }
    assert got == want, {
        i: (got[i], want[i]) for i in got if got[i] != want[i]
    }


@given(
    left_rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.integers(0, 100),
        ),
        min_size=0,
        max_size=10,
    ),
    right_rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.integers(0, 100),
        ),
        min_size=0,
        max_size=10,
    ),
    join_type=st.sampled_from(
        ["INNER", "LEFT", "FULL", "SEMI", "ANTI"]
    ),
    null_safe=st.booleans(),
)
@SET
def test_generated_join_null_semantics_match_duckdb(
    left_rows, right_rows, join_type, null_safe
):
    """Join-type × null-key differential: NULL keys never match under
    plain equality but DO under null-safe equality (Spark <=> vs SQL
    IS NOT DISTINCT FROM); SEMI/ANTI/FULL each handle the unmatched
    side differently. Fuzz all of it on tiny tables with nullable
    keys — the null-handling corner every hand-written oracle pair
    tiptoes around."""
    import pandas as pd

    ldf = SPARK.createDataFrame(
        [(k, v) for k, v in left_rows] or [(None, -1)],
        "lk int, lv int",
    )
    rdf = SPARK.createDataFrame(
        [(k, v) for k, v in right_rows] or [(None, -1)],
        "rk int, rv int",
    )
    cond = (
        ldf["lk"].eqNullSafe(rdf["rk"])
        if null_safe
        else ldf["lk"] == rdf["rk"]
    )
    stype = {
        "INNER": "inner",
        "LEFT": "left",
        "FULL": "full",
        "SEMI": "left_semi",
        "ANTI": "left_anti",
    }[join_type]
    j = ldf.join(rdf, cond, stype)
    if join_type in ("SEMI", "ANTI"):
        j = j.select("lk", "lv")
        cols_sql = "l.lk, l.lv"
    else:
        j = j.select("lk", "lv", "rk", "rv")
        cols_sql = "l.lk, l.lv, r.rk, r.rv"
    nk = lambda t: tuple((x is None, x or 0) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in j.collect()), key=nk)
    fuzz_l = pd.DataFrame(  # noqa: F841 — DuckDB reads it by name
        [(k, v) for k, v in left_rows] or [(None, -1)],
        columns=["lk", "lv"],
        dtype="Int64",
    )
    fuzz_r = pd.DataFrame(  # noqa: F841
        [(k, v) for k, v in right_rows] or [(None, -1)],
        columns=["rk", "rv"],
        dtype="Int64",
    )
    op = "IS NOT DISTINCT FROM" if null_safe else "="
    sql = {
        "INNER": f"SELECT {cols_sql} FROM fuzz_l l JOIN fuzz_r r ON l.lk {op} r.rk",
        "LEFT": f"SELECT {cols_sql} FROM fuzz_l l LEFT JOIN fuzz_r r ON l.lk {op} r.rk",
        "FULL": f"SELECT {cols_sql} FROM fuzz_l l FULL JOIN fuzz_r r ON l.lk {op} r.rk",
        "SEMI": f"SELECT {cols_sql} FROM fuzz_l l SEMI JOIN fuzz_r r ON l.lk {op} r.rk",
        "ANTI": f"SELECT {cols_sql} FROM fuzz_l l ANTI JOIN fuzz_r r ON l.lk {op} r.rk",
    }[join_type]
    want = sorted(
        (
            tuple(None if pd.isna(x) else int(x) for x in row)
            for row in DUCK.execute(sql).fetchall()
        ),
        key=nk,
    )
    assert got == want, (sql, got[:5], want[:5])


@given(
    cols=st.sets(
        st.sampled_from(["o_orderstatus", "o_orderpriority"]),
        min_size=1,
        max_size=2,
    ),
    mode=st.sampled_from(["ROLLUP", "CUBE", "GROUPING SETS"]),
    p1=_predicates(),
)
@SET
def test_generated_grouping_analytics_match_duckdb(cols, mode, p1):
    """ROLLUP/CUBE/GROUPING SETS differential: subtotal-row NULL
    markers and GROUPING() flags are where multi-level aggregation
    diverges between engines — fuzz random column subsets and modes
    with a random filter underneath."""
    cols = sorted(cols)
    sc1, sql1 = p1
    col_list = ", ".join(cols)
    if mode == "GROUPING SETS":
        # every prefix + the grand total — a rollup spelled explicitly
        sets = ", ".join(
            "(" + ", ".join(cols[:i]) + ")" for i in range(len(cols), 0, -1)
        )
        group_sql = f"GROUPING SETS ({sets}, ())"
    else:
        group_sql = f"{mode}({col_list})"
    grouping_flags = ", ".join(f"GROUPING({c})" for c in cols)
    sql = f"""
    SELECT {col_list}, {grouping_flags},
           CAST(count(*) AS BIGINT) AS n,
           floor(sum(o_totalprice)*100 + 0.50005)/100 AS s
    FROM orders WHERE {sql1}
    GROUP BY {group_sql}
    """
    got = sorted(
        (tuple(r) for r in SPARK.sql(
            sql.replace("FROM orders", "FROM spark_orders")
        ).collect()),
        key=lambda t: tuple((x is None, x if x is not None else 0) for x in t),
    )
    want = sorted(
        (tuple(r) for r in DUCK.execute(sql).fetchall()),
        key=lambda t: tuple((x is None, x if x is not None else 0) for x in t),
    )
    assert len(got) == len(want), (sql, len(got), len(want))
    for gr, wr in zip(got, want):
        for a, b in zip(gr, wr):
            if isinstance(a, float) and isinstance(b, float):
                assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-6), (sql, gr, wr)
            else:
                assert a == b or (a is None and b is None), (sql, gr, wr)


@pytest.fixture(scope="module", autouse=True)
def _orders_view(spark, _bind):
    from financial_data_pipeline_optimization_spark.sources import load_table

    load_table(spark, SF_SMOKE, "orders").createOrReplaceTempView(
        "spark_orders"
    )


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=10,
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=1,
        max_size=10,
    ),
    direction=st.sampled_from(["backward", "forward"]),
)
@SET
def test_asof_join_matches_duckdb_native_asof(
    left_rows, right_rows, direction
):
    """operators.joins.asof_join (union-tag-window composition) vs
    DuckDB's NATIVE ASOF JOIN on random keyed event/quote streams —
    boundary inclusivity (<= / >=) and equal-timestamp ties are
    exactly where as-of implementations disagree. Right side is
    deduped to one row per (key, ts) first: with duplicate
    timestamps 'the' as-of row is ill-defined and both engines pick
    arbitrarily."""
    import pandas as pd

    from financial_data_pipeline_optimization_spark.operators.joins import (
        asof_join,
    )

    right_dedup = {}
    for k, t, v in right_rows:
        right_dedup[(k, t)] = v
    rr = [(k, t, v) for (k, t), v in sorted(right_dedup.items())]

    ldf = SPARK.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k int, lt long",
    ).withColumn("lt", F.timestamp_seconds("lt"))
    rdf = SPARK.createDataFrame(
        rr, "k int, rt long, val int"
    ).withColumn("rt", F.timestamp_seconds("rt"))
    j = asof_join(
        ldf, rdf, on=["k"], left_ts="lt", right_ts="rt",
        direction=direction,
    )
    got = {
        r["lid"]: (
            None if r["rt"] is None else int(r["rt"].timestamp()),
            r["val"],
        )
        for r in j.collect()
    }
    fuzz_left = pd.DataFrame(  # noqa: F841 — DuckDB reads it by name
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["lid", "k", "lt"],
    )
    fuzz_right = pd.DataFrame(  # noqa: F841
        rr, columns=["k", "rt", "val"]
    )
    op = ">=" if direction == "backward" else "<="
    want = {
        r[0]: (r[1], r[2])
        for r in DUCK.execute(
            f"""
            SELECT l.lid, r.rt, r.val
            FROM fuzz_left l
            ASOF LEFT JOIN fuzz_right r
              ON l.k = r.k AND l.lt {op} r.rt
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for lid in got:
        assert got[lid] == want[lid], (direction, lid, got[lid], want[lid])


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from("xyz")),
        min_size=0,
        max_size=8,
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from("xyz")),
        min_size=0,
        max_size=8,
    ),
    op=st.sampled_from(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
         "EXCEPT", "EXCEPT ALL"]
    ),
)
@SET
def test_generated_set_ops_match_duckdb(left_rows, right_rows, op):
    """Set-operation differential: DISTINCT vs ALL (bag) semantics
    with duplicate rows on both sides — EXCEPT ALL/INTERSECT ALL
    multiplicity arithmetic is a classic engine divergence."""
    import pandas as pd

    schema = "a int, b string"
    ldf = SPARK.createDataFrame(left_rows or [(None, None)], schema)
    rdf = SPARK.createDataFrame(right_rows or [(None, None)], schema)
    sdf = {
        "UNION": ldf.union(rdf).distinct(),
        "UNION ALL": ldf.unionAll(rdf),
        "INTERSECT": ldf.intersect(rdf),
        "INTERSECT ALL": ldf.intersectAll(rdf),
        "EXCEPT": ldf.subtract(rdf),
        "EXCEPT ALL": ldf.exceptAll(rdf),
    }[op]
    nk = lambda t: tuple((x is None, x or 0) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in sdf.collect()), key=nk)
    fuzz_sl = pd.DataFrame(  # noqa: F841 — DuckDB reads it by name
        left_rows or [(None, None)], columns=["a", "b"]
    )
    fuzz_sr = pd.DataFrame(  # noqa: F841
        right_rows or [(None, None)], columns=["a", "b"]
    )
    want = sorted(
        (
            tuple(
                None if pd.isna(x) else (int(x) if i == 0 else x)
                for i, x in enumerate(row)
            )
            for row in DUCK.execute(
                f"SELECT a, b FROM fuzz_sl {op} SELECT a, b FROM fuzz_sr"
            ).fetchall()
        ),
        key=nk,
    )
    assert got == want, (op, got, want)


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=10,
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 9)),
        min_size=1,
        max_size=10,
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol_s=st.sampled_from([None, 0, 3, 10]),
)
@SET
def test_asof_nearest_and_tolerance_match_python_reference(
    left_rows, right_rows, direction, tol_s
):
    """The asof_join contract DuckDB's native ASOF cannot express:
    direction='nearest' (closer of backward/forward, ties to
    backward) and the tolerance window (matches farther than
    tolerance discarded, left row kept with nulls). Oracle is an
    explicit per-row Python reference, so the tie and boundary rules
    are spelled out rather than inherited from another engine."""
    from financial_data_pipeline_optimization_spark.operators.joins import (
        asof_join,
    )

    right_dedup = {}
    for k, t, v in right_rows:
        right_dedup[(k, t)] = v
    rr = [(k, t, v) for (k, t), v in sorted(right_dedup.items())]

    ldf = SPARK.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k int, lt long",
    ).withColumn("lt", F.timestamp_seconds("lt"))
    rdf = SPARK.createDataFrame(
        rr, "k int, rt long, val int"
    ).withColumn("rt", F.timestamp_seconds("rt"))
    j = asof_join(
        ldf, rdf, on=["k"], left_ts="lt", right_ts="rt",
        direction=direction,
        tolerance=None if tol_s is None else f"{tol_s} seconds",
    )
    got = {
        r["lid"]: (
            None if r["rt"] is None else int(r["rt"].timestamp()),
            r["val"],
        )
        for r in j.collect()
    }

    def pick(k, lt):
        back = [(t, v) for (kk, t, v) in rr if kk == k and t <= lt]
        fwd = [(t, v) for (kk, t, v) in rr if kk == k and t >= lt]
        b = max(back, default=None)
        f = min(fwd, default=None)
        if direction == "backward":
            m = b
        elif direction == "forward":
            m = f
        else:  # nearest: closer wins, ties to backward
            if b is None:
                m = f
            elif f is None:
                m = b
            else:
                m = b if (lt - b[0]) <= (f[0] - lt) else f
        if m is not None and tol_s is not None and abs(m[0] - lt) > tol_s:
            m = None
        return (None, None) if m is None else m

    want = {
        i: pick(k, lt) for i, (k, lt) in enumerate(left_rows)
    }
    assert set(got) == set(want)
    for lid in got:
        assert got[lid] == want[lid], (
            direction, tol_s, lid, got[lid], want[lid],
        )
