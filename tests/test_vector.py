"""Invariants for the similarity-search operators: approximate paths
are graded against the exact brute-force baseline; sketch aggregates
against exact aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark.operators import vector
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_CORRECTNESS


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_brute_force_topk_shape(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    rows = vector.brute_force_topk(emb, queries, k=5).collect()
    by_q = _topk_sets(rows)
    assert len(by_q) == 8
    assert all(len(v) == 5 for v in by_q.values())
    assert all(r.query_id != r.neighbor_id for r in rows)
    sims = [r.cosine_sim for r in rows]
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


def test_brute_force_arrow_matches_jvm_path(spark):
    """The Arrow matmul path and the pure-JVM expression path are two
    implementations of the same exact operator: identical neighbors,
    identical ranks, sims equal to well past the registry's 4-decimal
    rounding (they differ only in float summation order)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    a = {key(r): r for r in
         vector.brute_force_topk(emb, queries, k=5, arrow=True).collect()}
    j = {key(r): r for r in
         vector.brute_force_topk(emb, queries, k=5, arrow=False).collect()}
    assert a.keys() == j.keys()
    for kk in a:
        assert a[kk].neighbor_id == j[kk].neighbor_id, kk
        assert abs(a[kk].cosine_sim - j[kk].cosine_sim) < 1e-9, kk


def test_brute_force_query_collect_is_bounded(spark):
    """A query side larger than ``max_collect_queries`` must NOT be
    collected to the driver: the arrow path falls back to the
    broadcast-crossJoin plan (query side stays a distributed relation)
    and still returns the exact same top-k. Exercised with a tiny bound
    so the guard logic itself is what's under test — the fallback
    decision is the same at 10 rows or 10 billion."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    bounded = {
        key(r): r
        for r in vector.brute_force_topk(
            emb, queries, k=5, arrow=True, max_collect_queries=3
        ).collect()
    }
    reference = {
        key(r): r
        for r in vector.brute_force_topk(
            emb, queries, k=5, arrow=False
        ).collect()
    }
    assert bounded.keys() == reference.keys()
    for kk in bounded:
        assert bounded[kk].neighbor_id == reference[kk].neighbor_id, kk
        assert abs(bounded[kk].cosine_sim - reference[kk].cosine_sim) < 1e-9


def test_lsh_topk_recall(spark):
    """Single-probe sign-LSH: every returned neighbor must be genuinely
    bucket-colliding and scored exactly; require non-trivial overlap
    with the exact top-k (loose bound — 8 planes, 1 probe)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(vector.brute_force_topk(emb, queries, k=5).collect())
    approx = _topk_sets(
        vector.lsh_topk(emb, queries, k=5, num_planes=4).collect()
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.2, f"LSH recall {hits}/{total} too low"


def _recall(exact, approx):
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    return hits / total


def test_ivf_topk_recall(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(vector.brute_force_topk(emb, queries, k=5).collect())
    approx = _topk_sets(vector.ivf_topk(emb, queries, k=5).collect())
    assert _recall(exact, approx) >= 0.3, "IVF recall too low"


def test_ivf_training_improves_kmeans_objective(spark):
    """Lloyd rounds must strictly improve the spherical-k-means
    objective (mean cosine of each vector to its assigned centroid)
    over the lowest-id seeds — the guaranteed-monotone quantity that
    makes the 'trained centroids' claim real. Recall@k on a
    uniform-random fixture can wobble by a neighbor either way, so the
    recall assertion is only no-big-regression plus a floor."""
    import numpy as np

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    X = np.asarray(
        [r[0] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    X = X / np.linalg.norm(X, axis=1, keepdims=True)

    def unit(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    def objective(cen):
        return float((X @ unit(cen).T).max(axis=1).mean())

    obj_seed = objective(vector.train_ivf_centroids(emb, 16, iters=0))
    obj_trained = objective(vector.train_ivf_centroids(emb, 16, iters=2))
    assert obj_trained > obj_seed, (obj_trained, obj_seed)

    queries = emb.filter(F.col("vec_id") < 8)
    exact = _topk_sets(vector.brute_force_topk(emb, queries, k=5).collect())
    seeded = _topk_sets(
        vector.ivf_topk(emb, queries, k=5, train_iters=0).collect()
    )
    trained = _topk_sets(
        vector.ivf_topk(emb, queries, k=5, train_iters=2).collect()
    )
    r_seed, r_train = _recall(exact, seeded), _recall(exact, trained)
    assert r_train >= r_seed - 0.1, (r_train, r_seed)
    assert r_train >= 0.3


def test_ivf_assignment_has_no_interpreted_crossjoin(spark):
    """Cell assignment must be the Arrow-matmul scan, not a
    corpus×centroids crossJoin evaluating interpreted HOF lambdas
    per pair (r1 verdict perf flag)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    df = vector.ivf_topk(emb, queries, k=5)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan


def test_embedding_near_dup_symmetric_threshold(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    pairs = vector.embedding_near_dup_pairs(emb, threshold=0.9).collect()
    assert all(p.a < p.b for p in pairs)
    assert all(p.cosine_sim >= 0.9 for p in pairs)


def test_approx_aggregates_within_bounds(spark):
    orders = load_table(spark, SF_CORRECTNESS, "orders")
    approx = {
        r.o_orderstatus: (r.approx_customers, r.approx_median_price)
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
            F.percentile_approx("o_totalprice", 0.5).alias(
                "approx_median_price"
            ),
        )
        .collect()
    }
    exact = {
        r.o_orderstatus: (r.n, r.med)
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n"),
            F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        )
        .collect()
    }
    for status, (n_approx, med_approx) in approx.items():
        n_exact, med_exact = exact[status]
        assert abs(n_approx - n_exact) / n_exact < 0.1
        assert abs(med_approx - med_exact) / med_exact < 0.1


def test_embedding_near_dup_finds_planted_pairs(spark):
    """Planting 3 exact duplicates exercises the positive path at every
    SF (at sf0.001 the raw table has no >=0.9 pair, so a 0-row result
    would be indistinguishable from a broken operator): each planted
    copy must be reported as a pair with its source at cosine ~1.0.
    The registry's oracle-paired twin is embedding_near_dup_check."""
    from financial_data_pipeline_optimization_spark.sources import load_table

    from .conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    planted_src = (
        emb.orderBy("vec_id")
        .limit(3)
        .withColumn(
            "vec_id", F.col("vec_id") + F.lit(10_000_000).cast("long")
        )
    )
    corpus = emb.unionByName(planted_src)
    rows = vector.embedding_near_dup_pairs(corpus, threshold=0.9).collect()
    planted = {
        (r.a, r.b) for r in rows if r.b >= 10_000_000 and r.cosine_sim > 0.999
    }
    assert {(b - 10_000_000, b) for _, b in planted} == planted
    assert len(planted) >= 3


def test_kmeans_inertia_monotone_and_assignment_is_argmax(spark):
    """Lloyd's guarantee: the spherical-k-means objective Σ(1 − cos)
    is non-increasing across iterations, and the final assignment is
    to the true max-cosine centroid (cross-checked against a numpy
    recompute over the collected small fixture)."""
    import numpy as np

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    cen, inertias = vector.train_ivf_centroids(
        emb, num_centroids=8, iters=3, track_inertia=True
    )
    assert len(inertias) == 3
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-9, inertias

    unit = vector._unit_rows(cen)
    assigned = vector._nearest_cells(
        emb, unit, 1, "vec_id", "embedding", "vec_id", with_sim=True
    ).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    assert len(assigned) == len(vecs)
    for r in assigned:
        sims = unit @ (vecs[r["vec_id"]] / np.linalg.norm(vecs[r["vec_id"]]))
        assert abs(sims.max() - r["sim"]) < 1e-9
        assert sims[r["cell"]] >= sims.max() - 1e-9


def test_kmeans_untracked_return_shape_unchanged(spark):
    """track_inertia defaults off and keeps the bare-matrix return
    (the IVF call sites rely on it)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    cen = vector.train_ivf_centroids(emb, num_centroids=4, iters=1)
    assert getattr(cen, "shape", None) == (4, 64)


def test_pq_codebooks_shape_and_determinism(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    b1 = vector.train_pq_codebooks(emb, m=8, k_codes=16, iters=1)
    b2 = vector.train_pq_codebooks(emb, m=8, k_codes=16, iters=1)
    assert b1.shape == (8, 16, 8)
    assert (b1 == b2).all(), "codebook training must be deterministic"


def test_pq_encode_codes_in_range(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    books = vector.train_pq_codebooks(emb, m=8, k_codes=16, iters=1)
    rows = vector.pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.pq_codes) == 8
        assert all(0 <= c < 16 for c in r.pq_codes)


def test_pq_adc_approximates_cosine(spark):
    """ADC scores from 16×16 codes must track true cosine: mean
    absolute error below 0.2 and positive rank correlation over the
    scored pairs — the quantitative version of 'approximates'."""
    import numpy as np

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    approx = {
        (r.query_id, r.neighbor_id): r.adc_sim
        for r in vector.pq_topk(emb, q, k=20, m=16, k_codes=16).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in vector.brute_force_topk(emb, q, k=1 << 20).collect()
    }
    common = sorted(set(approx) & set(exact))
    assert len(common) >= 40
    a = np.asarray([approx[p] for p in common])
    e = np.asarray([exact[p] for p in common])
    assert np.abs(a - e).mean() < 0.2, np.abs(a - e).mean()
    assert np.corrcoef(a, e)[0, 1] > 0.0


def test_pq_topk_recall_floor(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in vector.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in vector.pq_topk(emb, q, k=5, m=16, k_codes=16).collect()
    }
    nq = q.count()
    assert len(exact & approx) / (5 * nq) >= 0.2


def test_pq_topk_empty_query_side(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 0)  # empty
    assert vector.pq_topk(emb, q, k=3, m=8, k_codes=8).count() == 0


def test_pq_store_roundtrip_matches_direct(spark, tmp_path):
    """Persist the PQ index to parquet, read it back, search — results
    must equal the direct pq_topk on the same corpus/queries (codes
    and codebooks are the complete search state)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    direct = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in vector.pq_topk(emb, q, k=4, m=8, k_codes=16).collect()
    }
    codes_df, books_df = vector.pq_store(emb, m=8, k_codes=16)
    codes_df.write.parquet(str(tmp_path / "codes"))
    books_df.write.parquet(str(tmp_path / "books"))
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in vector.pq_search_store(
            spark.read.parquet(str(tmp_path / "codes")),
            spark.read.parquet(str(tmp_path / "books")),
            q,
            k=4,
        ).collect()
    }
    assert got == direct


def test_mmr_rerank_prefers_diversity(spark):
    """With two near-identical top candidates and one diverse third,
    MMR at moderate lambda keeps rank-1 relevance but promotes the
    diverse candidate to rank 2; at lambda=1 it degrades to pure
    relevance order."""
    q = [(100, [1.0, 1.0, 0.0, 0.0])]
    corpus = [
        (1, [1.0, 0.0, 0.0, 0.0]),     # rel ~.71
        (2, [0.98, 0.0, 0.001, 0.0]),  # near-copy of 1, rel just under
        (3, [0.0, 1.0, 0.0, 0.0]),     # rel ~.71, orthogonal to 1
    ]
    cdf = spark.createDataFrame(
        corpus, "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(q, "vec_id long, embedding array<double>")
    cands = vector.brute_force_topk(cdf, qdf, k=3)
    diverse = {
        r.mmr_rank: r.neighbor_id
        for r in vector.mmr_rerank(cands, cdf, k=3, lam=0.5).collect()
    }
    assert diverse[1] == 1
    assert diverse[2] == 3, diverse  # the near-copy of 1 is demoted
    pure = {
        r.mmr_rank: r.neighbor_id
        for r in vector.mmr_rerank(cands, cdf, k=3, lam=1.0).collect()
    }
    # pure relevance: c1 and c3 tie at 1/sqrt(2) (id breaks), c2 last
    assert [pure[i] for i in (1, 2, 3)] == [1, 3, 2]


def test_mmr_rerank_matches_python_reference(spark):
    """Greedy MMR on a real corpus slice vs a direct python
    recomputation (same lambda, same tie rule)."""
    import numpy as np

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    cands = vector.brute_force_topk(emb, q, k=12)
    lam = 0.7
    got = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in vector.mmr_rerank(cands, emb, k=5, lam=lam).collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    by_q = {}
    for r in cands.collect():
        by_q.setdefault(r.query_id, []).append(
            (r.neighbor_id, r.cosine_sim)
        )
    for qid, lst in by_q.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        ids = [i for i, _ in lst]
        rel = {i: s for i, s in lst}
        unit = {
            i: vecs[i] / (np.linalg.norm(vecs[i]) or 1.0) for i in ids
        }
        picked, max_sim = [], {i: 0.0 for i in ids}
        for rank in range(1, 6):
            best, best_score = None, -1e18
            for i in ids:
                if i in picked:
                    continue
                sc = lam * rel[i] - (1 - lam) * max_sim[i]
                if sc > best_score or (
                    sc == best_score and i < best
                ):
                    best, best_score = i, sc
            picked.append(best)
            for i in ids:
                max_sim[i] = max(
                    max_sim[i], float(unit[i] @ unit[best])
                )
            assert got[(qid, rank)] == best, (qid, rank, got[(qid, rank)], best)


def test_pq_query_side_over_bound_raises_typed_error(spark):
    """An over-bound query batch must fail with QueryBatchTooLarge
    BEFORE any driver collect (the silent-OOM failure mode), on both
    the direct and the persisted-store PQ paths."""
    import pytest

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    with pytest.raises(vector.QueryBatchTooLarge):
        vector.pq_topk(emb, q, k=3, m=8, k_codes=8, max_collect_queries=4)
    codes_df, books_df = vector.pq_store(emb, m=8, k_codes=8)
    with pytest.raises(vector.QueryBatchTooLarge):
        vector.pq_search_store(
            codes_df, books_df, q, k=3, max_collect_queries=4
        )
    # At the bound exactly, the search runs.
    ok = vector.pq_topk(
        emb, q.limit(4), k=3, m=8, k_codes=8, max_collect_queries=4
    )
    assert ok.count() > 0


def test_pq_store_corpus_smaller_than_k_codes(spark):
    """A corpus with fewer rows than k_codes trains a smaller codebook;
    pq_store must enumerate the TRAINED shape (books.shape), not the
    requested k_codes, and search must still round-trip."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings").filter(
        F.col("vec_id") < 6
    )
    codes_df, books_df = vector.pq_store(emb, m=8, k_codes=16)
    n_codes = books_df.select("code").distinct().count()
    assert n_codes == 6  # trained = corpus rows, not 16
    q = emb.filter(F.col("vec_id") < 2)
    out = vector.pq_search_store(codes_df, books_df, q, k=3).collect()
    assert len(out) > 0


def test_pq_zero_norm_embedding_never_nan(spark):
    """An all-zero embedding must not poison training/encoding/scoring
    with NaN: it encodes to valid codes and scores finite sims."""
    import math as _math

    base = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .filter(F.col("vec_id") < 12)
        .select("vec_id", "embedding")
    )
    zero = spark.createDataFrame(
        [(10_000, [0.0] * 64)], "vec_id bigint, embedding array<float>"
    )
    corpus = base.unionByName(zero)
    q = corpus.filter(
        (F.col("vec_id") < 3) | (F.col("vec_id") == 10_000)
    )
    rows = vector.pq_topk(corpus, q, k=3, m=8, k_codes=8).collect()
    assert rows, "zero-norm corpus must still produce results"
    assert all(_math.isfinite(r.adc_sim) for r in rows)


def _pq_result_key(rows):
    return {(r.query_id, r.neighbor_id, r.rank) for r in rows}


def test_pq_chunked_over_bound_matches_unchunked(spark):
    """The hash-chunked over-bound search must return EXACTLY the
    bounded path's results (codes/codebooks are immutable, so
    per-chunk searches compose), while never collecting more than the
    bound per chunk. Broadcast is disabled for this test so 'chunk'
    cannot auto-upgrade — the chunk loop itself is what's exercised."""
    emb = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
    )
    q = emb.filter(F.col("vec_id") < 12)

    direct = _pq_result_key(
        vector.pq_topk(emb, q, k=3, m=8, k_codes=8).collect()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        chunked = _pq_result_key(
            vector.pq_topk(
                emb, q, k=3, m=8, k_codes=8,
                max_collect_queries=4, on_over_bound="chunk",
            ).collect()
        )
        assert chunked == direct and len(direct) > 0
        # store path too
        codes_df, books_df = vector.pq_store(emb, m=8, k_codes=8)
        store_chunked = _pq_result_key(
            vector.pq_search_store(
                codes_df, books_df, q, k=3,
                max_collect_queries=4, on_over_bound="chunk",
            ).collect()
        )
        assert store_chunked == direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pq_broadcast_over_bound_matches_chunked_and_direct(spark):
    """VERDICT r6 #6: a 10×-over-bound query set driven through the
    broadcast search (the auto-upgrade of on_over_bound='chunk' when
    the LUT table fits the broadcast threshold) must match the chunked
    path's results exactly — which must match the bounded path. Also
    pins that 'chunk' with a normal threshold actually TAKES the
    broadcast path's plan (no driver collect of 41 queries: the scored
    relation exists only with the distributed-LUT join)."""
    emb = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
    )
    q = emb.filter(F.col("vec_id") < 41)  # bound 4 -> >10x over

    direct = _pq_result_key(
        vector.pq_topk(emb, q, k=3, m=8, k_codes=8).collect()
    )
    # forced broadcast
    broadcast = _pq_result_key(
        vector.pq_topk(
            emb, q, k=3, m=8, k_codes=8,
            max_collect_queries=4, on_over_bound="broadcast",
        ).collect()
    )
    assert broadcast == direct and len(direct) > 0
    # 'chunk' auto-upgrades: LUT bytes (41 × 8·8 doubles) are far
    # under the default 10 MB threshold, so this is the broadcast plan
    auto = vector.pq_topk(
        emb, q, k=3, m=8, k_codes=8,
        max_collect_queries=4, on_over_bound="chunk",
    )
    assert "__lut" not in auto.columns  # internal col never escapes
    assert _pq_result_key(auto.collect()) == direct
    # store path, forced broadcast
    codes_df, books_df = vector.pq_store(emb, m=8, k_codes=8)
    store_bc = _pq_result_key(
        vector.pq_search_store(
            codes_df, books_df, q, k=3,
            max_collect_queries=4, on_over_bound="broadcast",
        ).collect()
    )
    assert store_bc == direct


def test_pq_chunk_skew_rechunks_instead_of_raising(spark):
    """ADVICE r6: xxhash64 skew can land more than the bound in one
    chunk; the chunk loop must recursively re-chunk under a fresh salt
    instead of raising QueryBatchTooLarge from the very path meant to
    handle over-bound sets. bound=1 with 12 queries puts >=2 ids in
    some chunk (deterministic hash, verified collision), which the old
    per-chunk probe would have raised on."""
    emb = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
    )
    q = emb.filter(F.col("vec_id") < 12)
    direct = _pq_result_key(
        vector.pq_topk(emb, q, k=3, m=8, k_codes=8).collect()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        skewed = _pq_result_key(
            vector.pq_topk(
                emb, q, k=3, m=8, k_codes=8,
                max_collect_queries=1, on_over_bound="chunk",
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert skewed == direct


def test_pq_rejects_unknown_over_bound_policy(spark):
    """ADVICE r6: a typo like 'chunked' must fail fast with ValueError,
    not silently degrade to the error path."""
    import pytest

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="on_over_bound"):
        vector.pq_topk(emb, q, k=3, on_over_bound="chunked")
    codes_df, books_df = vector.pq_store(emb.filter(F.col("vec_id") < 20))
    with pytest.raises(ValueError, match="on_over_bound"):
        vector.pq_search_store(
            codes_df, books_df, q, on_over_bound="Broadcast"
        )


def test_pq_duplicate_query_ids_hit_depth_cap(spark):
    """VERDICT r8 #1: >bound DUPLICATE query ids defeat hash re-chunking
    (equal ids share a chunk under every salt), so the chunk loop must
    stop at the depth cap with a typed QueryBatchTooLarge naming the
    duplicate-id cause — not recurse forever."""
    import pytest

    emb = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
    )
    one = emb.filter(F.col("vec_id") == 1)
    dup_q = one
    for _ in range(3):
        dup_q = dup_q.unionAll(dup_q)  # 8 copies of vec_id=1
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.raises(
            vector.QueryBatchTooLarge, match="DUPLICATE"
        ):
            vector.pq_topk(
                emb, dup_q, k=3, m=8, k_codes=8,
                max_collect_queries=1, on_over_bound="chunk",
            ).collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pq_numpy_jvm_sims_bit_identical(spark):
    """VERDICT r8 #3 / ADVICE r7 medium: the numpy ADC path folds the m
    LUT entries in the same left-to-right order as the broadcast path's
    JVM F.aggregate, so adc_sim is bit-identical between the two paths
    (== on the raw doubles, no tolerance) at m=8 and m=16 — the ulp
    flips that ndarray.sum's unrolled reduction introduced can no
    longer swap row_number ties at the k boundary."""
    emb = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
    )
    q = emb.filter(F.col("vec_id") < 9)
    for m in (8, 16):
        codes_df, books_df = vector.pq_store(emb, m=m, k_codes=8)
        direct = {
            (r.query_id, r.neighbor_id): r.adc_sim
            for r in vector.pq_search_store(
                codes_df, books_df, q, k=4
            ).collect()
        }
        bc = {
            (r.query_id, r.neighbor_id): r.adc_sim
            for r in vector.pq_search_store(
                codes_df, books_df, q, k=4,
                max_collect_queries=2, on_over_bound="broadcast",
            ).collect()
        }
        assert direct, f"m={m}: empty result"
        assert set(direct) == set(bc), f"m={m}: neighbor sets diverge"
        for key, sim in direct.items():
            assert sim == bc[key], (
                f"m={m}: sims not bit-identical at {key}: "
                f"{sim!r} != {bc[key]!r}"
            )


def test_ivf_store_roundtrip_matches_direct(spark, tmp_path):
    """ivf_store -> parquet (partitioned by cell) -> ivf_search_store
    must reproduce ivf_topk exactly over the same centroids — the IVF
    twin of the PQ persisted-index contract. Also pins the layout
    property the docstring sells: the cells table round-trips through
    a partitioned-by-cell write, so probed-cell scans are partition
    pruning at scale."""
    emb = (
        load_table(spark, SF_CORRECTNESS, "embeddings")
        .select("vec_id", "embedding")
    )
    q = emb.filter(F.col("vec_id") < 8)
    direct = {
        (r.query_id, r.neighbor_id): (r.rank, r.cosine_sim)
        for r in vector.ivf_topk(
            emb, q, k=4, num_centroids=8, nprobe=3, train_iters=1
        ).collect()
    }
    cells, cents = vector.ivf_store(
        emb, num_centroids=8, train_iters=1
    )
    cells.write.partitionBy("cell").parquet(str(tmp_path / "cells"))
    cents.write.parquet(str(tmp_path / "cents"))
    got = {
        (r.query_id, r.neighbor_id): (r.rank, r.cosine_sim)
        for r in vector.ivf_search_store(
            spark.read.parquet(str(tmp_path / "cells")),
            spark.read.parquet(str(tmp_path / "cents")),
            q,
            k=4,
            nprobe=3,
        ).collect()
    }
    assert got == direct and len(direct) > 0
