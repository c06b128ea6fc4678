"""Invariants for the r5c curation operators: shingle novelty,
CCNet-style relative length gating, template-prefix detection.

Each operator also has a driver-checked SQL oracle
(``queries.py``: shingle_novelty_score / relative_length_filter /
template_prefix_flags); these tests pin the semantic edge cases the
oracle's real-data run may not exercise, plus the plan-shape contract
that documents never enter an Exchange.
"""

from __future__ import annotations

from financial_data_pipeline_optimization_spark.operators import dedup, text

from .test_plan_quality import _executed_plan, _walk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_novelty_copy_scores_zero(spark):
    """An exact copy of an earlier doc has novelty 0; the earliest
    occurrence (and any disjoint doc) scores 1."""
    df = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six"),
        ],
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_seen_before, r.novelty_frac)
        for r in dedup.shingle_novelty(df, "doc_id", "text", n=3).collect()
    }
    assert got[1] == (4, 0, 1.0)
    assert got[2] == (4, 4, 0.0)
    assert got[3] == (4, 0, 1.0)


def test_shingle_novelty_partial_overlap_fraction(spark):
    """A doc sharing exactly half its shingles with an earlier doc
    scores 0.5 — the fraction is per-DISTINCT-shingle, not per token."""
    df = _docs(
        spark,
        [
            (1, "a b c d"),  # bigrams: ab bc cd
            (2, "a b x y"),  # bigrams: ab bx xy -> 1 of 3 seen
        ],
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_seen_before)
        for r in dedup.shingle_novelty(df, "doc_id", "text", n=2).collect()
    }
    assert got[2] == (3, 1)


def test_shingle_novelty_shuffles_text_only_in_spread(spark):
    """The only Exchange allowed to carry the text column is the one
    deliberate ``_spread`` repartition (keyed on doc_id, before the
    shingle map); every shingle-keyed exchange downstream moves only
    (hash, id, aggregate) rows."""
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    out = dedup.shingle_novelty(df, "doc_id", "text", n=2)
    out.collect()
    exchanges = [
        n for n in _walk(_executed_plan(out)) if "Exchange" in n.nodeName()
    ]
    assert exchanges, "plan has no Exchange node — wrong plan?"
    with_text = 0
    for ex in exchanges:
        child = ex.children().apply(0)
        out_attrs = child.output()
        names = [out_attrs.apply(i).name() for i in range(out_attrs.length())]
        head = ex.toString().splitlines()[0]
        if "text" in names:
            with_text += 1
            assert "doc_id" in head and "__h" not in head, head
        else:
            continue
    assert with_text <= 1, f"{with_text} exchanges carried text"


def test_relative_length_flags_trim_boundaries(spark):
    """100 docs with token counts 1..100 in one group, lo=5/hi=98:
    kept iff cum>5 and cum-1<98  ⇔  count in [6, 98]. Pure integer
    arithmetic — the boundary verdicts are exact, not interpolated."""
    rows = [(i, "g", " ".join(["w"] * i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: r.keep
        for r in text.relative_length_flags(
            df, "doc_id", "lang", "text", lo_pct=5, hi_pct=98
        ).collect()
    }
    kept = sorted(i for i, k in got.items() if k)
    assert kept == list(range(6, 99))


def test_relative_length_flags_uniform_group_all_kept(spark):
    """A group where every doc has the same length keeps everything:
    cum==tot (so cum*100 > lo*tot) and cum-n == 0 (< hi*tot)."""
    rows = [(i, "g", "one two three") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = text.relative_length_flags(df, "doc_id", "lang", "text")
    assert all(r.keep for r in out.collect())


def test_relative_length_flags_groups_are_independent(spark):
    """The gate is per-group: a 5-token doc is an outlier among
    100-token docs but normal among its own kind."""
    rows = [(i, "long", " ".join(["w"] * 100)) for i in range(20)]
    rows += [(100, "long", "a b c d e")]
    rows += [(200 + i, "short", "a b c d e") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: r.keep
        for r in text.relative_length_flags(
            df, "doc_id", "lang", "text"
        ).collect()
    }
    assert got[100] is False  # bottom 1/21 of the "long" group
    assert all(got[200 + i] for i in range(20))


def test_template_prefix_flags_source_scoped(spark):
    """Shared first-k prefix flags docs only within the SAME source;
    the identical prefix in another source does not flag."""
    rows = [
        (1, "s1", "the quick brown fox jumps over the lazy dog"),
        (2, "s1", "the quick brown fox jumps onto something else"),
        (3, "s2", "the quick brown fox jumps right past here"),
        (4, "s1", "completely different opening words here now"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = {
        r.doc_id: r.is_template
        for r in text.template_prefix_flags(
            df, "doc_id", "source", "text", k=5, min_docs=2
        ).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False}


def test_relative_length_flags_join_is_broadcast(spark):
    """The flags join must broadcast the tiny (group, count) verdict
    table — a sort-merge join here would sort the whole corpus."""
    from financial_data_pipeline_optimization_spark.sources import load_table
    from .conftest import SF_CORRECTNESS

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    df = text.relative_length_flags(docs, "doc_id", "lang", "text")
    df.collect()
    nodes = [n.nodeName() for n in _walk(_executed_plan(df))]
    assert any("BroadcastHashJoin" in n for n in nodes), nodes
    assert not any("SortMergeJoin" in n for n in nodes), nodes


def test_template_prefix_probe_side_never_shuffles(spark):
    """Only the (source, prefix-hash) profile may exchange; the probe
    side's per-document rows stay in place and the join broadcasts.
    One shuffle total, and no Exchange input carries the text column."""
    from financial_data_pipeline_optimization_spark.sources import load_table
    from .conftest import SF_CORRECTNESS

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    df = text.template_prefix_flags(docs, "doc_id", "source", "text")
    df.collect()
    plan = _executed_plan(df)
    shuffles = [
        n
        for n in _walk(plan)
        if n.nodeName().startswith("Exchange")
        or "ShuffleExchange" in n.nodeName()
    ]
    assert len(shuffles) == 1, [n.nodeName() for n in _walk(plan)]
    for ex in shuffles:
        out_attrs = ex.children().apply(0).output()
        names = [
            out_attrs.apply(i).name() for i in range(out_attrs.length())
        ]
        assert "text" not in names, names
    assert any(
        "BroadcastHashJoin" in n.nodeName() for n in _walk(plan)
    )


def test_no_inferred_size_filter_recomputes_shingles(spark):
    """Regression gate for the explode() inferred-filter pathology:
    plain explode makes Catalyst infer size(<array expr>) > 0 and push
    it below the Generate with the FULL array expression substituted —
    the shingle construction then runs twice (and, pushed through an
    Exchange, on the pre-shuffle partitioning: 20× at sf0.1). The
    shingle/token explode sites use functions.explode_nonempty, so no
    Filter node in these plans may contain the shingle-builder
    expression (concat_ws over a slice)."""
    from .conftest import SF_SMOKE
    from .test_plan_quality import SPECS

    for name in ("shingle_novelty_score", "corpus_top_bigrams",
                 "contamination_report", "unigram_logprob_score"):
        df = SPECS[name].spark(spark, SF_SMOKE)
        for node in _walk(_executed_plan(df)):
            if node.nodeName().startswith("Filter"):
                cond = node.toString().splitlines()[0]
                assert "concat_ws" not in cond, (name, cond[:200])
                assert "regexp_replace" not in cond, (name, cond[:200])
