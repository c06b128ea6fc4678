"""Property-based invariants (hypothesis) for the core operators.

Oracle parity pins behavior on the driver's fixed tables; these pin the
algebraic contracts on adversarial small inputs: dedup semantics match a
reference pandas implementation, upsert is key-idempotent, stable ids
don't depend on partitioning, fingerprints/signatures are pure functions
of content. Examples are kept small (each runs Spark jobs) but the
generators explore duplicates, empty strings, and key collisions that
fixed fixtures never hit.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.functions import stable_id
from financial_data_pipeline_optimization_spark.operators import dedup, joins

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)

#: (key, version, payload) rows — small domains force collisions.
ROWS = st.lists(
    st.tuples(
        st.integers(0, 4),
        st.integers(0, 6),
        st.integers(-100, 100),
    ),
    min_size=1,
    max_size=24,
)


@pytest.fixture(scope="module", autouse=True)
def _spark(spark):
    # bind the session fixture once; hypothesis re-runs the test body,
    # not the fixture, so examples share one SparkSession
    global SPARK
    SPARK = spark
    yield


@given(rows=ROWS)
@SET
def test_keep_latest_matches_pandas(rows):
    df = SPARK.createDataFrame(rows, "k long, v long, payload long")
    got = sorted(
        map(
            tuple,
            dedup.keep_latest(df, ["k"], ["v", "payload"]).collect(),
        )
    )
    pdf = pd.DataFrame(rows, columns=["k", "v", "payload"])
    want = sorted(
        pdf.sort_values(["k", "v", "payload"], ascending=[True, False, False])
        .drop_duplicates(subset=["k"], keep="first")
        .itertuples(index=False, name=None)
    )
    assert got == want


@given(rows=ROWS)
@SET
def test_upsert_key_set_and_precedence(rows):
    mid = len(rows) // 2 or 1
    target = SPARK.createDataFrame(rows[:mid], "k long, v long, payload long")
    batch = SPARK.createDataFrame(
        rows[mid:] or rows[:1], "k long, v long, payload long"
    )
    merged = joins.anti_join_upsert(target, batch, ["k"])
    got_keys = {r.k for r in merged.select("k").distinct().collect()}
    want_keys = {r[0] for r in rows[:mid]} | {
        r[0] for r in (rows[mid:] or rows[:1])
    }
    assert got_keys == want_keys
    # existing keys win: anti-join upsert never overwrites the target
    target_rows = {tuple(r) for r in target.collect()}
    merged_rows = {tuple(r) for r in merged.collect()}
    assert target_rows <= merged_rows


@given(rows=ROWS)
@SET
def test_stable_id_invariant_under_partitioning(rows):
    df = SPARK.createDataFrame(rows, "k long, v long, payload long")
    a = (
        df.withColumn("id", stable_id("k", "v"))
        .select("k", "v", "id")
        .collect()
    )
    b = (
        df.repartition(7, "payload")
        .withColumn("id", stable_id("k", "v"))
        .select("k", "v", "id")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_key = {}
    for r in a:
        by_key.setdefault((r.k, r.v), set()).add(r.id)
    assert all(len(ids) == 1 for ids in by_key.values())


TEXTS = st.lists(
    st.text(
        alphabet="ab c.d!",
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=TEXTS)
@SET
def test_exact_dedup_keeps_one_per_content(texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = SPARK.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_dedup(df, ["text"], "doc_id").collect()
    # one representative per normalized content, always the lowest id
    def norm(t):
        return " ".join(t.lower().split())

    groups = {}
    for i, t in rows:
        groups.setdefault(norm(t), []).append(i)
    want = sorted(min(ids) for ids in groups.values())
    assert sorted(r.doc_id for r in out) == want


@given(texts=TEXTS)
@SET
def test_minhash_signature_is_content_function(texts):
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (i + 1000, t) for i, t in enumerate(texts)
    ]
    df = SPARK.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.with_minhash_signature(
        dedup.with_shingles(df, "text"), num_hashes=16
    ).collect()
    by_id = {r.doc_id: tuple(r.minhash) for r in sig}
    for i, _ in enumerate(texts):
        assert by_id[i] == by_id[i + 1000]
        assert len(by_id[i]) == 16


@given(rows=ROWS)
@SET
def test_hash_sample_is_layout_invariant_and_consistent(rows):
    from financial_data_pipeline_optimization_spark.operators import sampling

    df = SPARK.createDataFrame(rows, "k long, v long, payload long")
    a = {tuple(r) for r in sampling.hash_sample(df, ["k", "v"], 0.5).collect()}
    b = {
        tuple(r)
        for r in sampling.hash_sample(
            df.repartition(5, "payload"), ["k", "v"], 0.5
        ).collect()
    }
    assert a == b
    # fraction=1 keeps everything, fraction=0 keeps nothing
    assert sampling.hash_sample(df, ["k"], 1.0).count() == df.count()
    assert sampling.hash_sample(df, ["k"], 0.0).count() == 0
    # the two hash paths select by the same contract (not necessarily
    # the same rows): both are deterministic supersets/subsets by key
    x1 = {tuple(r) for r in sampling.hash_sample(df, ["k"], 0.5, method="xxhash64").collect()}
    x2 = {tuple(r) for r in sampling.hash_sample(df, ["k"], 0.5, method="xxhash64").collect()}
    assert x1 == x2


@given(rows=ROWS)
@SET
def test_split_is_total_and_disjoint(rows):
    from financial_data_pipeline_optimization_spark.operators import sampling

    df = SPARK.createDataFrame(rows, "k long, v long, payload long").distinct()
    out = sampling.with_split(
        df, ["k", "v"], {"train": 0.7, "test": 0.3}
    ).collect()
    assert len(out) == df.count()  # total: every row assigned
    by_key = {}
    for r in out:
        by_key.setdefault((r.k, r.v), set()).add(r.split)
    # same key → same split, always
    assert all(len(s) == 1 for s in by_key.values())


#: Documents from a tiny vocabulary — forces shared shingles, near-dups
#: and exact dups that a fixed fixture never covers systematically.
DOCS = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=2,
    max_size=10,
)


@given(texts=DOCS)
@SET
def test_prefix_filtered_jaccard_matches_brute_force(texts):
    """The prefix-filtered + size-filtered + hash-verified implementation
    must return EXACTLY the naive all-pairs answer (prefix filtering has
    no false negatives; the filters only skip pairs the threshold
    already excludes)."""
    t = 0.5
    df = SPARK.createDataFrame(
        list(enumerate(texts)), "id long, txt string"
    )
    got = {
        (r.a, r.b): round(r.jaccard_sim, 9)
        for r in dedup.ngram_jaccard_pairs(
            df, "id", "txt", n=2, min_jaccard=t
        ).collect()
    }

    def shingles(s):
        toks = s.split()
        k = max(len(toks) - 1, 1)
        return {" ".join(toks[i : i + 2]) for i in range(k)}

    want = {}
    sets = {i: shingles(s) for i, s in enumerate(texts)}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                j = inter / union if union else 0.0
                if j >= t:
                    want[(a, b)] = round(j, 9)
    assert got == want


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=0,
        max_size=400,
    ),
    chunk_size=st.integers(2, 50),
    overlap_frac=st.floats(0.0, 0.9),
)
@SET
def test_chunk_text_cover_and_overlap_invariants(
    text, chunk_size, overlap_frac
):
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    overlap = min(int(chunk_size * overlap_frac), chunk_size - 1)
    stride = chunk_size - overlap
    df = SPARK.createDataFrame([(1, text)], "id long, txt string")
    rows = sorted(
        text_ops.chunk_text(
            df, "id", "txt", chunk_size=chunk_size, overlap=overlap
        ).collect(),
        key=lambda r: r.chunk_index,
    )
    if not text:
        assert rows == []
        return
    # every chunk is the exact substring at its offset
    for r in rows:
        assert r.chunk_text == text[r.chunk_start : r.chunk_start + chunk_size]
    # stride-prefix reassembly reproduces the document exactly
    rebuilt = (
        "".join(r.chunk_text[:stride] for r in rows[:-1])
        + rows[-1].chunk_text
    )
    assert rebuilt == text
    # minimal cover: dropping the last chunk leaves a tail uncovered
    if len(rows) > 1:
        covered_without_last = rows[-2].chunk_start + chunk_size
        assert covered_without_last < len(text)


@given(
    sizes=st.lists(st.integers(1, 30), min_size=1, max_size=20),
    budget=st.integers(5, 60),
)
@SET
def test_pack_chunks_stream_cut_invariants(sizes, budget):
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    df = SPARK.createDataFrame(
        [(0, i, s) for i, s in enumerate(sizes)],
        "shard int, idx int, n_tok int",
    )
    rows = sorted(
        text_ops.pack_chunks(df, "shard", ["idx"], "n_tok", budget).collect(),
        key=lambda r: r.idx,
    )
    # bin ids are exactly the stream-offset cut: floor(start/budget)
    offset = 0
    for r, s in zip(rows, sizes):
        assert r.bin_id == offset // budget
        offset += s
    # bins are contiguous and non-decreasing
    bins = [r.bin_id for r in rows]
    assert bins == sorted(bins)
    assert bins[0] == 0


#: (entity, seq, value-or-null) rows for fill/median invariants
TS_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 9),
        st.one_of(st.none(), st.integers(-50, 50)),
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=TS_ROWS)
@SET
def test_forward_fill_matches_pandas_ffill(rows):
    from financial_data_pipeline_optimization_spark.operators import timeseries

    df = SPARK.createDataFrame(
        [(e, s, float(v) if v is not None else None) for e, s, v in rows],
        "entity long, seq long, v double",
    )
    got = {
        (r.entity, r.seq): r.v
        for r in timeseries.forward_fill(
            df, "entity", ["seq"], ["v"]
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["entity", "seq", "v"]).astype(
        {"v": "float64"}
    )
    pdf = pdf.sort_values(["entity", "seq"])
    pdf["v"] = pdf.groupby("entity")["v"].ffill()
    for _, row in pdf.iterrows():
        expect = None if pd.isna(row.v) else row.v
        assert got[(row.entity, row.seq)] == expect


@given(rows=TS_ROWS)
@SET
def test_rolling_median_matches_pandas(rows):
    from financial_data_pipeline_optimization_spark.operators import timeseries

    filled = [(e, s, float(v if v is not None else 0)) for e, s, v in rows]
    df = SPARK.createDataFrame(filled, "entity long, seq long, v double")
    got = {
        (r.entity, r.seq): r.rolling_median
        for r in timeseries.with_rolling_median(
            df, "entity", ["seq"], "v", window=3
        ).collect()
    }
    pdf = pd.DataFrame(filled, columns=["entity", "seq", "v"]).sort_values(
        ["entity", "seq"]
    )
    pdf["med"] = (
        pdf.groupby("entity")["v"]
        .rolling(3, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    for _, row in pdf.iterrows():
        assert got[(row.entity, row.seq)] == pytest.approx(row.med)


#: undirected edges over a small node domain — forces multi-component
#: graphs, chains, self-loops and duplicate edges
EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=20,
)


@given(edges=EDGES)
@SET
def test_connected_components_matches_union_find(edges):
    from financial_data_pipeline_optimization_spark.operators.graph import (
        connected_components,
    )

    df = SPARK.createDataFrame(edges, "a long, b long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    expect = {}
    roots: dict[int, int] = {}
    for n in parent:
        r = find(n)
        roots[r] = min(roots.get(r, n), n)
    for n in parent:
        expect[n] = roots[find(n)]
    assert got == expect


@given(
    syms=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    pair=st.sampled_from([("a", "a"), ("a", "b"), ("b", "c"), ("c", "a")]),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_merge_fold_matches_python_reference(syms, pair):
    """The JVM (out, pending) fold must equal the textbook greedy
    left-to-right BPE merge for arbitrary symbol sequences, including
    overlapping runs."""
    from pyspark.sql import functions as F

    from financial_data_pipeline_optimization_spark.operators.text import _merge_pair_fold

    a, b = pair
    expect, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            expect.append(a + b)
            i += 2
        else:
            expect.append(syms[i])
            i += 1
    df = SPARK.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(
        _merge_pair_fold(F.col("syms"), a, b).alias("m")
    ).collect()[0].m
    assert got == expect, (syms, pair, got, expect)


#: (start, length) integer intervals, negative coordinates included so
#: the floor-toward-−∞ bucketing is exercised.
INTERVALS = st.lists(
    st.tuples(st.integers(-30, 30), st.integers(0, 12)),
    min_size=1,
    max_size=16,
)


@given(a=INTERVALS, b=INTERVALS, cell=st.integers(1, 9))
@SET
def test_interval_overlap_join_matches_naive(a, b, cell):
    """Grid-bucketed overlap join ≡ the naive inequality join for any
    interval sets and any cell width — pair-exact (the first-shared-
    cell dedup must emit each overlapping pair exactly once), spans
    both shorter and longer than the cell, negative coordinates."""
    adf = SPARK.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(a)],
        "aid long, as1 long, ae1 long",
    )
    bdf = SPARK.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(b)],
        "bid long, bs1 long, be1 long",
    )
    got = sorted(
        (r["aid"], r["bid"])
        for r in joins.interval_overlap_join(
            adf, bdf, "as1", "ae1", "bs1", "be1", cell=cell
        ).collect()
    )
    expect = sorted(
        (ai, bi)
        for ai, (as_, al) in enumerate(a)
        for bi, (bs_, bl) in enumerate(b)
        if as_ <= bs_ + bl and bs_ <= as_ + al
    )
    assert got == expect


@given(
    counts=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 30)),
        min_size=1,
        max_size=40,
    ),
    lo=st.integers(0, 40),
    hi=st.integers(60, 100),
)
@SET
def test_relative_length_flags_matches_python_reference(
    spark, counts, lo, hi
):
    """relative_length_flags vs a direct python recomputation of the
    integer-CDF rule on arbitrary grouped count multisets — the
    keep verdict is keep ⇔ cum_le(c)*100 > lo*tot AND
    cum_lt(c)*100 < hi*tot, per group."""
    rows = [
        (i, g, " ".join(["w"] * c)) for i, (g, c) in enumerate(counts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    from financial_data_pipeline_optimization_spark.operators.text import (
        relative_length_flags,
    )

    got = {
        r.doc_id: r.keep
        for r in relative_length_flags(
            df, "doc_id", "lang", "text", lo_pct=lo, hi_pct=hi
        ).collect()
    }
    by_group: dict[str, list[int]] = {}
    for g, c in counts:
        by_group.setdefault(g, []).append(c)
    for i, (g, c) in enumerate(counts):
        vals = by_group[g]
        tot = len(vals)
        cum_le = sum(1 for v in vals if v <= c)
        cum_lt = sum(1 for v in vals if v < c)
        want = cum_le * 100 > lo * tot and cum_lt * 100 < hi * tot
        assert got[i] == want, (i, g, c, got[i], want)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_shingle_novelty_matches_python_reference(spark, docs):
    """shingle_novelty vs direct python first-sighting recomputation
    on arbitrary small token streams (unigram shingles so the python
    twin stays trivial)."""
    from financial_data_pipeline_optimization_spark.operators.dedup import (
        shingle_novelty,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shingles, r.n_seen_before)
        for r in shingle_novelty(df, "doc_id", "text", n=1).collect()
    }
    first: dict[str, int] = {}
    for i, toks in enumerate(docs):
        for t in set(toks):
            first.setdefault(t, i)
    for i, toks in enumerate(docs):
        distinct = set(toks)
        seen = sum(1 for t in distinct if first[t] < i)
        assert got[i] == (len(distinct), seen), (i, got[i])


#: (doc_id, cluster_id, order_val) — small domains force big clusters,
#: singletons, order ties, and negative order values.
LABEL_ROWS = st.lists(
    st.tuples(
        st.integers(0, 30),
        st.integers(0, 4),
        st.integers(-5, 5),
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda r: r[0],
)


@SET
@given(rows=LABEL_ROWS, min_members=st.integers(1, 3))
def test_elect_representatives_matches_python_reference(
    spark, rows, min_members
):
    """Election over an arbitrary label table == the obvious Python
    reference: per cluster with >= min_members members, keep the
    (max order_val, min doc_id) row; report the member count."""
    labels = spark.createDataFrame(
        rows, "doc_id long, cluster_id long, n_chars long"
    )
    got = {
        (r.cluster_id, r.n_members, r.rep_id, r.rep_order)
        for r in dedup.elect_representatives(
            labels, min_members=min_members
        ).collect()
    }
    by_cluster: dict[int, list[tuple[int, int]]] = {}
    for doc_id, cid, order in rows:
        by_cluster.setdefault(cid, []).append((doc_id, order))
    want = set()
    for cid, members in by_cluster.items():
        if len(members) < min_members:
            continue
        rep = max(members, key=lambda m: (m[1], -m[0]))
        want.add((cid, len(members), rep[0], rep[1]))
    assert got == want


#: (day, integer price) rows; negative days exercise floor-toward-−∞
#: week bucketing, duplicate days exercise the day-grain aggregation.
DAY_PRICES = st.lists(
    st.tuples(st.integers(-10, 24), st.integers(1, 1000)),
    min_size=1,
    max_size=20,
)


@given(a=DAY_PRICES, b=DAY_PRICES)
@SET
def test_interval_weekly_factorization_matches_pair_enumeration(a, b):
    """The day-grain factorization behind ``interval_overlap_weekly``
    (queries/governance.py): per-week COUNT and SUM over the pair set
    {(a,b): |a.day − b.day| ≤ 3} equal Σ n_d·n_e and
    Σ (n_d·s_e + n_e·s_d) over day pairs. Integer prices make both
    sides exact (no float tolerance), so this pins the algebra —
    including duplicate days, empty weeks, and negative day
    coordinates — against a naive pair enumeration."""
    adf = SPARK.createDataFrame(list(a), "asd long, p long")
    bdf = SPARK.createDataFrame(list(b), "bsd long, p long")
    a_day = adf.groupBy("asd").agg(
        F.count(F.lit(1)).alias("an"), F.sum("p").alias("as")
    )
    b_day = bdf.groupBy("bsd").agg(
        F.count(F.lit(1)).alias("bn"), F.sum("p").alias("bs")
    )
    got = {
        r["wk"]: (r["n_pairs"], r["pv"])
        for r in (
            a_day.withColumn(
                "bsd",
                F.explode(F.sequence(F.col("asd") - 3, F.col("asd") + 3)),
            )
            .join(F.broadcast(b_day), "bsd")
            .groupBy(F.floor(F.col("asd") / 7).cast("long").alias("wk"))
            .agg(
                F.sum(F.col("an") * F.col("bn")).alias("n_pairs"),
                F.sum(
                    F.col("an") * F.col("bs") + F.col("bn") * F.col("as")
                ).alias("pv"),
            )
            .collect()
        )
    }
    expect: dict[int, list[int]] = {}
    for ad, ap in a:
        for bd, bp in b:
            if abs(ad - bd) <= 3:
                wk = ad // 7
                acc = expect.setdefault(wk, [0, 0])
                acc[0] += 1
                acc[1] += ap + bp
    assert got == {k: tuple(v) for k, v in expect.items()}


@given(
    num_hashes=st.integers(min_value=1, max_value=512),
    min_jaccard=st.floats(
        min_value=0.001, max_value=1.0, allow_nan=False
    ),
)
@settings(max_examples=300, deadline=None)
def test_derive_banding_properties(num_hashes, min_jaccard):
    """The r14 banding rule, fuzzed over the whole knob space:
    (a) bands * rows always equals the hash budget;
    (b) the chosen midpoint (1/b)^(1/r) never exceeds the verify
        threshold UNLESS no divisor pair sits at-or-below it (then the
        documented rows=1 fallback — the most permissive banding);
    (c) MAXIMALITY: no other divisor pair has a midpoint that is both
        at-or-below the threshold and closer to it — the rule never
        leaves candidate-pruning power on the table while respecting
        the recall side."""
    from financial_data_pipeline_optimization_spark.operators.dedup import derive_banding

    b, r = derive_banding(num_hashes, min_jaccard)
    assert b * r == num_hashes
    assert b >= 1 and r >= 1
    mid = (1.0 / b) ** (1.0 / r)
    candidates = [
        (bb, num_hashes // bb)
        for bb in range(1, num_hashes + 1)
        if num_hashes % bb == 0
    ]
    eligible = [
        (bb, rr)
        for bb, rr in candidates
        if (1.0 / bb) ** (1.0 / rr) <= min_jaccard
    ]
    if not eligible:
        assert (b, r) == (num_hashes, 1)
    else:
        assert mid <= min_jaccard
        best = max(
            (1.0 / bb) ** (1.0 / rr) for bb, rr in eligible
        )
        assert mid == best
