"""Edge-case pins for ranking.py corpus queries whose driver oracle
only ever runs on the real (well-formed) corpus.

ADVICE r12 (high): ``bigram_interp_logprob`` fed ``explode_nonempty``
(an ``explode_outer``) an array that is NOT non-empty by construction
— the ``x != ''`` filter empties a punct-only doc's ``['']`` to ``[]``
and NULL text yields a NULL array — so every tokenless doc emitted a
``p=NULL`` phantom row whose ``xxhash64(NULL)`` is a non-null
constant, minting a phantom unigram that inflated the unigram counts
and the corpus total and shifted EVERY document's interpolated
log-prob vs the oracle. These tests pin the fix on a corpus the
driver's data never exercises.
"""

from __future__ import annotations

import math

import duckdb

from financial_data_pipeline_optimization_spark.queries.ranking import SPECS

BASE = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat and dog and cat the cat"),
    # single-token doc: contributes its unigram to uc/tot on BOTH
    # engines but has no bigrams, so it must not appear in the output
    (4, "solo"),
]

# Docs that tokenize to nothing: must contribute NOTHING — no output
# row, no unigram, no shift in anyone else's score.
TOKENLESS = [
    (5, "!!! ..."),
    (6, None),
    (7, ""),
    (8, "\t \r\n"),
]


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(path))


def test_bigram_logprob_tokenless_docs_change_nothing(spark, tmp_path):
    spec = SPECS["bigram_interp_logprob"]
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    _write_docs(spark, a / "documents.parquet", BASE)
    _write_docs(spark, b / "documents.parquet", BASE + TOKENLESS)

    ga = {
        r.doc_id: (r.n_bigrams, r.mean_neg_logprob)
        for r in spec.spark(spark, str(a)).collect()
    }
    gb = {
        r.doc_id: (r.n_bigrams, r.mean_neg_logprob)
        for r in spec.spark(spark, str(b)).collect()
    }
    # no output row for the single-token or tokenless docs
    assert set(ga) == {1, 2, 3}
    assert set(gb) == {1, 2, 3}
    # adding tokenless docs shifts nobody's score (pre-fix: every
    # tokenless doc added a phantom unigram to uc and tot)
    assert ga == gb

    # and the DuckDB oracle agrees on the adversarial corpus
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{b}/documents.parquet/*.parquet')"
        )
        want = {
            int(d): (int(n), float(m))
            for d, n, m in con.execute(spec.oracle).fetchall()
        }
    finally:
        con.close()
    assert set(gb) == set(want)
    for d, (n, m) in gb.items():
        wn, wm = want[d]
        assert n == wn, (d, n, wn)
        assert math.isclose(float(m), wm, abs_tol=1e-9), (d, m, wm)
