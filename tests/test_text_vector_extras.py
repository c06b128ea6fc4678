"""Invariants for winnowing fingerprints, salted joins, and the
stateful streaming operator."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark import schemas, streaming
from financial_data_pipeline_optimization_spark.operators import joins, text
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_CORRECTNESS, SF_SMOKE


def test_winnowing_shared_substring_shares_fingerprint(spark):
    """Winnowing guarantee: documents sharing a long substring share at
    least one fingerprint; disjoint documents share none (here: vs a
    text over a disjoint alphabet)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "SOMETHING the quick brown fox jumps over the lazy dog UNRELATED"),
        (3, "zzzzzzzz yyyyyyyy xxxxxxxx wwwwwwww vvvvvvvv uuuuuuuu"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {
        r.doc_id: set(r.fingerprints)
        for r in text.with_winnowing_fingerprints(df, "text").collect()
    }
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert not (fps[1] & fps[3]), "disjoint texts should not collide"


def test_winnowing_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = {
        r.doc_id: tuple(r.fingerprints)
        for r in text.with_winnowing_fingerprints(docs, "text").collect()
    }
    b = {
        r.doc_id: tuple(r.fingerprints)
        for r in text.with_winnowing_fingerprints(
            docs.repartition(5), "text"
        ).collect()
    }
    assert a == b


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_CORRECTNESS, "orders")
    customer = load_table(spark, SF_CORRECTNESS, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        joins.salted_join(orders, customer, ["o_custkey"])
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain} == {
        (r.c_mktsegment, r["count"]) for r in salted
    }


def test_stateful_running_counts(spark):
    """applyInPandasWithState accumulates across micro-batches: drive
    the events through 1-file-per-trigger batches and check the final
    per-key totals equal the batch aggregate."""
    d = tempfile.mkdtemp(prefix="stateful_")
    try:
        events = load_table(spark, SF_SMOKE, "events")
        # several files -> several micro-batches
        events.repartition(4).write.mode("overwrite").parquet(d)
        stream = streaming.read_stream_parquet(
            spark, d, schemas.TESTDATA["events"], max_files_per_trigger=1
        )
        q = (
            streaming.running_counts_stateful(stream)
            .writeStream.format("memory")
            .queryName("stateful_out")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # last update per key = running total after all batches
        final = {
            r.event_type: r.n_events
            for r in spark.sql(
                """SELECT event_type, n_events FROM (
                     SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY n_events DESC) rn
                     FROM stateful_out) WHERE rn = 1"""
            ).collect()
        }
        want = {
            r.event_type: r["count"]
            for r in events.groupBy("event_type").count().collect()
        }
        assert final == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_clean_text_and_redact_pii(spark):
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    rows = [
        (1, "Hello <b>world</b>,\x07   visit https://example.com/x?q=1 now"),
        (2, "mail me at jane.doe+spam@mail.example.org or +1 (555) 123-4567"),
        (3, "call 555-123-4567\tplease"),
        (4, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: r.text
        for r in text_ops.redact_pii(
            text_ops.clean_text(df, "text"), "text"
        ).collect()
    }
    # tag removal inserts a space where </b> was → "world ,"
    assert out[1] == "Hello world , visit <URL> now"
    assert "<EMAIL>" in out[2] and "jane" not in out[2]
    # phone with spaces is split by whitespace collapse; the digit-run
    # core must still be caught
    assert "<PHONE>" in out[2]
    assert out[3] == "call <PHONE> please"
    assert out[4] == "no pii here"


def test_repetition_stats_known_values(spark):
    from financial_data_pipeline_optimization_spark.operators import text

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], "id long, txt string"
    )
    got = {
        r.id: r for r in text.repetition_stats(df, "id", "txt").collect()
    }
    # doc 1: 4 tokens, 1 distinct, top=4/4, bigrams ["a a"]x3 -> dup 2/3
    assert got[1].n_tokens == 4
    assert got[1].distinct_token_frac == 0.25
    assert got[1].top_token_frac == 1.0
    assert abs(got[1].dup_bigram_frac - 2 / 3) < 1e-12
    # doc 2: all distinct
    assert got[2].n_tokens == 4
    assert got[2].distinct_token_frac == 1.0
    assert got[2].top_token_frac == 0.25
    assert got[2].dup_bigram_frac == 0.0


def test_line_dedup_reassembles_in_order(spark):
    from financial_data_pipeline_optimization_spark.operators import text

    df = spark.createDataFrame(
        [
            (1, "header\nbody one\nfooter"),
            (2, "header\nbody two\nfooter"),
            (3, "header\nfooter"),
        ],
        "id long, txt string",
    )
    got = {r.id: r.txt for r in text.line_dedup(df, "id", "txt").collect()}
    # doc 1 saw every line first and keeps all of them in order
    assert got[1] == "header\nbody one\nfooter"
    # doc 2 loses the boilerplate, keeps its unique body
    assert got[2] == "body two"
    # doc 3 was all boilerplate -> no surviving lines, absent from output
    assert 3 not in got


def test_decontaminate_drops_overlapping_docs(spark):
    from financial_data_pipeline_optimization_spark.operators import dedup

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "id long, txt string",
    )
    corpus = spark.createDataFrame(
        [
            # shares the 5-gram "alpha beta gamma delta epsilon"
            (1, "prefix alpha beta gamma delta epsilon suffix"),
            # no shared 5-gram
            (2, "one two three four five six seven"),
        ],
        "id long, txt string",
    )
    kept = [
        r.id
        for r in dedup.decontaminate(corpus, bench, "id", "txt", n=5).collect()
    ]
    assert kept == [2]


def test_chunk_text_covers_document_with_overlap(spark):
    doc = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    df = spark.createDataFrame([(1, doc)], "id long, txt string")
    rows = sorted(
        text.chunk_text(df, "id", "txt", chunk_size=100, overlap=20)
        .collect(),
        key=lambda r: r.chunk_index,
    )
    # stride 80: ceil((260-20)/80) = 3 chunks at 0, 80, 160
    assert [r.chunk_start for r in rows] == [0, 80, 160]
    assert rows[0].chunk_text == doc[0:100]
    assert rows[1].chunk_text == doc[80:180]
    assert rows[2].chunk_text == doc[160:260]
    # consecutive chunks share exactly `overlap` characters
    assert rows[0].chunk_text[-20:] == rows[1].chunk_text[:20]
    # reassembling stride-prefixes reproduces the document
    rebuilt = "".join(r.chunk_text[:80] for r in rows[:-1]) + rows[-1].chunk_text
    assert rebuilt == doc


def test_chunk_text_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, None)], "id long, txt string"
    )
    rows = text.chunk_text(df, "id", "txt", chunk_size=100, overlap=20).collect()
    # short doc -> exactly one chunk; empty/null -> no chunks
    assert len(rows) == 1 and rows[0].id == 1
    assert rows[0].chunk_text == "tiny" and rows[0].n_chunk_chars == 4


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "id long, txt string")
    with pytest.raises(ValueError):
        text.chunk_text(df, "id", "txt", chunk_size=10, overlap=10)


def test_chunk_tokens_windows_and_overlap(spark):
    words = [f"w{i:03d}" for i in range(25)]
    df = spark.createDataFrame([(1, " ".join(words))], "id long, txt string")
    rows = sorted(
        text.chunk_tokens(df, "id", "txt", chunk_size=10, overlap=4).collect(),
        key=lambda r: r.chunk_index,
    )
    # stride 6: ceil((25-4)/6) = 4 chunks at tokens 0, 6, 12, 18
    assert [r.chunk_start_token for r in rows] == [0, 6, 12, 18]
    assert rows[0].chunk_text == " ".join(words[0:10])
    assert rows[1].chunk_text == " ".join(words[6:16])
    assert rows[-1].chunk_text == " ".join(words[18:25])
    assert rows[-1].n_chunk_tokens == 7
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0].chunk_text.split()[-4:] == rows[1].chunk_text.split()[:4]


def test_chunk_tokens_canonicalizes_and_skips_tokenless(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "!!! ..."), (3, None)],
        "id long, txt string",
    )
    rows = text.chunk_tokens(df, "id", "txt", chunk_size=10, overlap=2).collect()
    # punctuation-only and null docs produce no chunks
    assert len(rows) == 1 and rows[0].id == 1
    assert rows[0].chunk_text == "hello world"


def test_chunk_token_counts_matches_chunk_tokens(spark):
    """The metadata-only twin must agree with the array path on the
    exact (id, chunk_index, n_chunk_tokens) rows — across doc lengths
    that hit every clamp: sub-chunk, exact multiple, straddler,
    punctuation-only and null (no rows)."""
    docs = [
        (1, " ".join(f"w{i}" for i in range(25))),   # 4 chunks, short tail
        (2, " ".join(f"v{i}" for i in range(10))),   # exactly one chunk
        (3, "one two three"),                        # sub-chunk doc
        (4, " ".join(f"u{i}" for i in range(16))),   # n-overlap = stride
        (5, "!!! ..."),                              # tokenless
        (6, None),
    ]
    df = spark.createDataFrame(docs, "id long, txt string")
    for cs, ov in ((10, 4), (10, 0), (7, 3)):
        want = sorted(
            (r.id, r.chunk_index, r.n_chunk_tokens)
            for r in text.chunk_tokens(
                df, "id", "txt", chunk_size=cs, overlap=ov
            ).collect()
        )
        got = sorted(
            (r.id, r.chunk_index, r.n_chunk_tokens)
            for r in text.chunk_token_counts(
                df, "id", "txt", chunk_size=cs, overlap=ov
            ).collect()
        )
        assert got == want, (cs, ov)


def test_tokens_extract_all_matches_replace_split_form(spark):
    """The regexp_extract_all tokenizer must be value-identical to the
    historical replace+trim+split form on every edge EXCEPT the one
    documented intentional divergence — documents whose first or last
    character is non-space whitespace (\\t, \\n, \\r, \\x0b, …), where
    the old form's space-only ``trim`` left spurious ``''`` tokens (a
    bug the differential fuzzer caught; the oracle contract moved to
    the runs form with the fix). Edges covered here: null, empty,
    punct-only (the [''] sentinel), unicode, underscores (Java \\w
    would keep them — [a-z0-9] must not), INTERNAL mixed whitespace
    incl. \\x0b, digit/letter runs, case folding. The divergent edge
    is pinned separately below as the NEW behavior."""
    rows = [
        (1, None),
        (2, ""),
        (3, "!!! ..."),
        (4, "Hello, World!"),
        (5, "a_b c\td\ne"),
        (6, "café déjà vu 42"),
        (7, "  leading and trailing  "),
        (8, "x1y2 z3"),
        (9, "_"),
        (10, "A\x0bB"),
        (11, "MiXeD CaSe 007"),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    old_form = F.split(
        F.trim(
            F.regexp_replace(F.lower(F.col("txt")), r"[^a-z0-9\s]", " ")
        ),
        r"\s+",
    )
    got = df.select(
        "id",
        old_form.alias("old"),
        text.tokens("txt").alias("new"),
    ).collect()
    for r in got:
        assert r.old == r.new, (r.id, r.old, r.new)


def test_tokens_nonspace_whitespace_edges_pin_new_behavior(spark):
    """Pin the fix itself: on leading/trailing NON-SPACE whitespace
    the old replace+trim+split form minted spurious '' tokens
    ('\\tabc' → ['', 'abc']; '\\r' → ['', '']) — the new
    regexp_extract_all form must yield exactly the alnum runs, with
    the [''] sentinel only for genuinely token-free non-null text."""
    rows = [
        (1, "\tabc"),
        (2, "abc\n"),
        (3, "\r"),
        (4, "\x0b x \x0b"),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    got = {
        r.id: r.new
        for r in df.select("id", text.tokens("txt").alias("new")).collect()
    }
    assert got[1] == ["abc"]
    assert got[2] == ["abc"]
    assert got[3] == [""]  # token-free → the sentinel, never ['','']
    assert got[4] == ["x"]


def test_regexp_token_count_matches_size_of_tokens(spark):
    """The regexp_count shortcut used by relative_length_flags /
    chunk_token_counts must equal size(tokens(..)) on every edge the
    tokenizer has: null, empty, punct-only (the [''] sentinel),
    unicode, mixed whitespace, digit runs — INCLUDING characters
    whose Unicode lowercase maps into ascii (Kelvin sign U+212A →
    'k', Å sign U+212B → 'å'): 'xKy' tokenizes to the single
    token ['xky'], so the shortcut must count runs of lower(text),
    not of the raw text (where [a-zA-Z0-9]+ would see 2 runs)."""
    rows = [
        (1, None),
        (2, ""),
        (3, "!!! ..."),
        (4, "Hello, World!"),
        (5, "a_b c\td\ne"),
        (6, "café déjà vu 42"),
        (7, "  leading and trailing  "),
        (8, "x1y2 z3"),
        (9, "xKy kelvin"),
        (10, "K"),
    ]
    df = spark.createDataFrame(rows, "id long, txt string")
    got = df.select(
        "id",
        F.size(text.tokens("txt")).alias("via_tokens"),
        F.when(
            F.col("txt").isNotNull(),
            F.greatest(
                F.regexp_count(F.lower(F.col("txt")), F.lit("[a-z0-9]+")),
                F.lit(1),
            ),
        ).alias("via_regexp"),
    ).collect()
    for r in got:
        assert r.via_tokens == r.via_regexp, (r.id, r.via_tokens, r.via_regexp)


def test_chunk_token_counts_rejects_bad_overlap(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "id long, txt string")
    with pytest.raises(ValueError):
        text.chunk_token_counts(df, "id", "txt", chunk_size=10, overlap=10)


def test_weighted_sample_extremes_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate([0.0] * 50 + [1.0] * 50)],
        "id long, w double",
    )
    from financial_data_pipeline_optimization_spark.operators import sampling

    kept = sampling.weighted_sample(df, ["id"], F.col("w")).collect()
    ids = {r.id for r in kept}
    # weight 0 rows can never be kept; weight >= 1 rows ALWAYS are
    # (the w>=1 sentinel bypasses the saturating hex threshold, which
    # alone would drop keys hashing to exactly 'ffffffff')
    assert ids == set(range(50, 100))
    # deterministic: same call, same kept-set, any partitioning
    again = {
        r.id
        for r in sampling.weighted_sample(
            df.repartition(7), ["id"], F.col("w")
        ).collect()
    }
    assert ids == again


def test_hash_topn_exact_size_stable_and_no_global_sort(spark):
    from financial_data_pipeline_optimization_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    picked = sampling.hash_topn(df, ["id"], 20)
    ids = sorted(r.id for r in picked.collect())
    assert len(ids) == 20
    # growing the corpus with keys that hash above the cut cannot
    # evict selected keys... but any new key CAN displace; what must
    # hold is determinism and exact size under relayout
    again = sorted(
        r.id
        for r in sampling.hash_topn(df.repartition(9), ["id"], 20).collect()
    )
    assert ids == again
    # plan is TakeOrderedAndProject (partition-local top-n), not a
    # global Sort + Limit
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_pack_chunks_concat_and_cut_semantics(spark):
    # one shard, chunks of 60 tokens each, budget 100:
    # stream offsets 0,60,120,180,240 -> bins 0,0,1,1,2
    df = spark.createDataFrame(
        [(1, i, 60) for i in range(5)],
        "shard int, idx int, n_tok int",
    )
    rows = sorted(
        text.pack_chunks(df, "shard", ["idx"], "n_tok", 100).collect(),
        key=lambda r: r.idx,
    )
    assert [r.bin_id for r in rows] == [0, 0, 1, 1, 2]
    # a chunk belongs to the bin where it STARTS (straddle allowed):
    # bin 0 holds offsets [0,100) starts -> chunks 0 and 1
    # shards pack independently
    df2 = df.union(
        spark.createDataFrame([(2, 0, 250)], "shard int, idx int, n_tok int")
    )
    rows2 = text.pack_chunks(df2, "shard", ["idx"], "n_tok", 100).collect()
    assert {r.bin_id for r in rows2 if r.shard == 2} == {0}


def test_stratified_hash_sample_respects_per_stratum_fractions(spark):
    from financial_data_pipeline_optimization_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "a" if i < 500 else "b") for i in range(1000)],
        "id long, grp string",
    )
    kept = sampling.stratified_hash_sample(
        df, "grp", {"a": 0.0}, ["id"], default_fraction=1.0
    ).collect()
    # stratum a fully dropped, stratum b fully kept
    assert all(r.grp == "b" for r in kept) and len(kept) == 500
    # fractional stratum: deterministic and roughly proportional
    half = sampling.stratified_hash_sample(
        df, "grp", {"a": 0.5, "b": 0.1}, ["id"]
    )
    counts = {
        r.grp: r.n
        for r in half.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert 200 < counts["a"] < 300 and 20 < counts["b"] < 80
    again = sampling.stratified_hash_sample(
        df.repartition(11), "grp", {"a": 0.5, "b": 0.1}, ["id"]
    ).count()
    assert again == half.count()


def test_register_views_enables_raw_sql(spark):
    from financial_data_pipeline_optimization_spark.sources import register_views

    views = register_views(spark, SF_SMOKE, names=["region", "nation"])
    assert set(views) == {"region", "nation"}
    n = spark.sql(
        "SELECT count(*) AS n FROM nation JOIN region "
        "ON n_regionkey = r_regionkey"
    ).collect()[0].n
    assert n == 25


# ---------------------------------------------------------------------------
# Duplicated-span stats, BPE pair counting, int8 quantization
# ---------------------------------------------------------------------------


def test_dup_span_stats_flags_planted_duplicate_span(spark):
    span = "one two three four five six seven eight"
    rows = [
        (1, f"{span} tail words here alpha beta"),
        (2, f"prefix tokens go {span} and more"),
        (3, "completely different words with no shared span at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in text.dup_span_stats(df, "doc_id", "text", n=8).collect()
    }
    # Doc1/doc2 share exactly the planted 8-gram (one position each);
    # doc3 shares nothing.
    assert got[1][1] == 1 and got[2][1] == 1
    assert got[3] == (got[3][0], 0)
    # Position counts: len(tokens) - 7 spans per doc (13 tokens each).
    assert got[1][0] == 13 - 7 and got[2][0] == 13 - 7


def test_dup_span_stats_counts_within_doc_repeats(spark):
    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, f"{span} x y z {span}")], "doc_id long, text string"
    )
    r = text.dup_span_stats(df, "doc_id", "text", n=8).first()
    # The planted 8-gram occurs at two positions of the SAME doc —
    # both positions are duplicated spans.
    assert r.n_dup_spans >= 2


def test_bpe_pair_counts_matches_hand_count(spark):
    # "abab" x3 + "ba" x1: pairs ab(2/word x3=6), ba(1x3 + 1 = 4)
    df = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab ba")], "id long, text string"
    )
    got = {
        r.pair: r.n_occurrences
        for r in text.bpe_pair_counts(df, "text", top_k=10).collect()
    }
    assert got == {"ab": 6, "ba": 4}


def test_bpe_pair_counts_deterministic_tie_break(spark):
    df = spark.createDataFrame([(1, "xy qr xy qr ab")], "id long, text string")
    rows = text.bpe_pair_counts(df, "text", top_k=2).collect()
    # qr/xy tie at 2 > ab at 1; lexicographic tie-break keeps qr, xy.
    assert [(r.pair, r.n_occurrences) for r in rows] == [
        ("qr", 2),
        ("xy", 2),
    ]


def test_quantize_int8_bounds_and_reconstruction(spark):
    from financial_data_pipeline_optimization_spark.operators import vector

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    qd = vector.quantize_int8(emb).select(
        "vec_id",
        "scale",
        F.array_min("q").alias("qmin"),
        F.array_max("q").alias("qmax"),
        F.array_max(
            F.zip_with(
                "embedding",
                "q",
                lambda x, qv: F.abs(
                    x.cast("double") - qv.cast("double") / F.col("scale")
                ),
            )
        ).alias("err"),
    )
    rows = qd.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert -127 <= r.qmin <= r.qmax <= 127
        assert r.err <= 1.0 / (2 * r.scale) + 1e-12


def test_quantize_int8_zero_vector_safe(spark):
    from financial_data_pipeline_optimization_spark.operators import vector

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.5, -1.0, 0.25])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in vector.quantize_int8(df).collect()}
    assert rows[1].q == [0, 0, 0]
    assert rows[2].q == [64, -127, 32]


def test_gopher_quality_stats_signals(spark):
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    rows = [
        (1, "the cat sat on the mat and that dog ran off with it be of"),
        (2, ""),  # empty text: no words, no crash, keep=False downstream
        (3, "- bullet one\n- bullet two\nplain line..."),
        (4, "#### #### #### symbols"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in text_ops.gopher_quality_stats(df, "doc_id", "text").collect()
    }
    assert got[1].n_words == 15
    assert got[1].n_stop_hits >= 5
    assert got[2].n_words == 0 and got[2].mean_word_len == 0.0
    assert abs(got[3].bullet_line_frac - 2 / 3) < 1e-9
    assert abs(got[3].ellipsis_line_frac - 1 / 3) < 1e-9
    # 12 '#' chars over 4 words -> symbol ratio 3.0
    assert abs(got[4].symbol_word_ratio - 3.0) < 1e-9
    assert got[4].alpha_word_frac == 0.25


def test_c4_line_stats_rules(spark):
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    keeper = "\n".join(
        ["this line has five words.", "and this one also qualifies!",
         "a third good line ends here?", "short."]
    )
    rows = [
        (1, keeper),
        (2, "only two good lines here sadly.\nanother fine line is kept."),
        (3, keeper + "\nlorem ipsum dolor"),
        (4, keeper + "\njson { blob }"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in text_ops.c4_line_stats(df, "doc_id", "text").collect()
    }
    assert got[1].keep and got[1].n_kept_lines == 3
    assert not got[2].keep and got[2].n_kept_lines == 2
    assert not got[3].keep and got[3].has_lorem
    assert not got[4].keep and got[4].has_brace


def test_bpe_merge_fold_is_greedy_left_to_right(spark):
    from pyspark.sql import functions as F

    from financial_data_pipeline_optimization_spark.operators.text import _merge_pair_fold

    df = spark.createDataFrame(
        [(1, ["a", "a", "a"]), (2, ["a", "a", "a", "a"]),
         (3, ["x", "a", "a", "y"]), (4, ["a"])],
        "id long, syms array<string>",
    )
    got = {
        r.id: r.m
        for r in df.select(
            "id", _merge_pair_fold(F.col("syms"), "a", "a").alias("m")
        ).collect()
    }
    assert got[1] == ["aa", "a"]
    assert got[2] == ["aa", "aa"]
    assert got[3] == ["x", "aa", "y"]
    assert got[4] == ["a"]


def test_bpe_train_learns_textbook_merges(spark):
    from financial_data_pipeline_optimization_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newer newest new")],
        "id long, text string",
    )
    out = [
        (r.round, r.merged, r.pair_count)
        for r in t.bpe_train_merges(df, "text", rounds=2).collect()
    ]
    assert out == [(1, "lo", 5), (2, "low", 5)]


def test_substring_dedup_matches_bruteforce(spark):
    """substring_dedup vs an independent in-Python reference of the
    same keep-first window semantics: planted cross-doc duplicate
    span, an intra-doc repeat, a short passthrough doc, and a fully
    duplicated doc that must disappear."""
    import re

    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    n = 3
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        # shares the 5-token prefix with doc 1 -> its windows lose
        # keep-first and the prefix is excised
        (2, "alpha beta gamma delta epsilon different tail words here"),
        # intra-doc repeat: 'one two three' twice in one doc
        (3, "one two three filler filler one two three trailing bit"),
        (4, "tiny doc"),  # < n tokens, passes through normalized
        (5, "alpha beta gamma delta"),  # fully covered -> disappears
    ]

    def tok(s):
        return [
            t
            for t in re.sub(r"[^a-z0-9\s]", " ", s.lower()).split()
            if t
        ]

    toked = {i: tok(t) for i, t in rows}
    occ = {}
    for i in sorted(toked):
        ts = toked[i]
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p : p + n]), []).append((i, p + 1))
    removed = {}
    for lst in occ.values():
        lst.sort()
        for i, p in lst[1:]:
            removed.setdefault(i, set()).add(p)
    expected = {}
    for i, ts in toked.items():
        rm = removed.get(i, set())
        kept = [
            t
            for idx, t in enumerate(ts)
            if not any(p <= idx + 1 < p + n for p in rm)
        ]
        if kept:
            expected[i] = " ".join(kept)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in text_ops.substring_dedup(
            df, "doc_id", "text", n=n
        ).collect()
    }
    assert got == expected
    assert 5 not in got  # fully duplicated doc disappeared
    assert got[4] == "tiny doc"  # short doc untouched
    assert "alpha" not in got[2]  # doc 2 lost the shared prefix
    # doc 3's second 'one two three' occurrence is excised
    assert got[3].count("one two three") == 1


def test_substring_dedup_idempotent_and_consistent_with_stats(spark):
    """Running the rewrite twice changes nothing (all surviving
    windows are unique), and afterwards dup_span_stats at the same n
    sees zero duplicated spans — the two operators agree on what a
    duplicate is."""
    from financial_data_pipeline_optimization_spark.operators import text as text_ops
    from financial_data_pipeline_optimization_spark.sources import load_table
    from .conftest import SF_SMOKE

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .limit(150)
    )
    n = 5
    once = text_ops.substring_dedup(docs, "doc_id", "text", n=n)
    once.localCheckpoint()
    twice = text_ops.substring_dedup(once, "doc_id", "text", n=n)
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text for r in twice.collect()}
    assert a == b
    # Consistency with the stats twin HOLDS ON THE REWRITE'S DOMAIN:
    # full n-token windows. (dup_span_stats additionally counts the
    # sub-n remainder of docs shorter than n — identical short docs
    # register there but are deliberately outside substring_dedup's
    # window semantics.)
    full = once.where(
        F.size(F.filter(text_ops.tokens("text"), lambda x: x != ""))
        >= n
    )
    stats = text_ops.dup_span_stats(full, "doc_id", "text", n=n)
    assert (
        stats.agg({"n_dup_spans": "sum"}).collect()[0][0] or 0
    ) == 0


def test_substring_dedup_fixpoint_removes_splice_minted_windows(spark):
    """The one-pass caveat, reproduced then closed: doc 2's duplicated
    middle span ('a b c d e', keep-first lost to doc 1) is excised,
    SPLICING 'p q' onto the single-token tail 'r' — which mints the
    window 'p q r', a verbatim duplicate of doc 3's prefix that did
    NOT exist as any window of the input (the tail alone is shorter
    than n, so no input window of doc 2 could collide with doc 3).
    One pass must leave that duplicate (pinning the caveat is real);
    the fixpoint must converge with ZERO duplicated windows in the
    output and keep-first must resolve the minted duplicate in doc 2's
    favor (lower id)."""
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    n = 3
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "p q a b c d e r"),
            (3, "p q r x y"),
        ],
        "doc_id long, text string",
    )
    once = text_ops.substring_dedup(df, "doc_id", "text", n=n)
    assert text_ops._dup_windows_remain(once, "text", n)  # caveat is real
    fixed = text_ops.substring_dedup_fixpoint(
        df, "doc_id", "text", n=n
    )
    got = {r.doc_id: r.text for r in fixed.collect()}
    # doc 2's splice-minted 'p q r' wins keep-first (lower id); doc 3
    # loses its copy and keeps only the unshared tail.
    assert got == {1: "a b c d e", 2: "p q r", 3: "x y"}
    assert not text_ops._dup_windows_remain(fixed, "text", n)


def test_substring_dedup_fixpoint_respects_max_passes(spark):
    """max_passes bounds the driver loop: with max_passes=1 the
    splice-minted duplicate survives (exactly the one-pass output);
    the default converges on the same corpus."""
    from financial_data_pipeline_optimization_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "p q a b c d e r"),
            (3, "p q r x y"),
        ],
        "doc_id long, text string",
    )
    one = text_ops.substring_dedup_fixpoint(
        df, "doc_id", "text", n=3, max_passes=1
    )
    assert text_ops._dup_windows_remain(one, "text", 3)
