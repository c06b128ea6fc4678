"""Vector similarity-search operators (BASELINE.json north star).

Embeddings are ``array<float>`` columns. Distance math comes in two
forms: Spark higher-order functions (``zip_with`` + ``aggregate``,
JVM-side, double precision, bit-identical to the DuckDB oracle's
``list_cosine_similarity`` loop) for per-pair expressions inside
joins, and Arrow-batched numpy matmul (``mapInPandas``) where a whole
corpus-batch × query-batch score matrix is needed — the expression
form evaluates its lambdas interpreted (no codegen), so the matmul is
~100× faster on the dense all-pairs shape.

Scale design:

- ``brute_force_topk``: exact k-NN — one corpus scan scoring each
  Arrow batch against the bounded query matrix, partition-local top-k,
  then a global merge of O(partitions·k·q) rows. No corpus shuffle.
  The correctness baseline.
- ``lsh_topk``: random-hyperplane LSH — signature computation is a
  narrow map; candidate generation is an equi-join on bucket ids
  (shuffles 8-byte keys, not vectors); exact re-rank only within
  buckets. The 100 TB path: cost ~ O(rows·planes·d) map + a
  key-balanced shuffle.
- ``ivf_topk``: inverted-file ANN (the IVF scheme of Jégou/Douze/
  Schmid, "Product quantization for nearest neighbor search", TPAMI
  2011, without the PQ compression) — spherical-k-means centroids
  trained as distributed dataflow, cells assigned per-row by one
  Arrow-matmul scan, probes the ``nprobe`` nearest cells only.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _unit_rows(mat):
    """Row-normalize a (n, d) float64 matrix, mapping zero-norm rows to
    the zero vector instead of NaN (an all-zero embedding then scores
    cosine 0 against everything and sorts last, rather than poisoning
    every downstream argmax/lexsort with NaN — the same guard
    ``mmr_rerank`` applies)."""
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns (double accumulation,
    sequential order — matches DuckDB's loop for oracle parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    arrow: bool = True,
    max_collect_queries: int = 65536,
) -> DataFrame:
    """Exact cosine top-k of every corpus row against a bounded query
    batch. Returns ``(query_id, neighbor_id, rank, cosine_sim)``,
    rank ties broken by ``neighbor_id`` (deterministic output).

    ``arrow=True`` (default): the scale path. The query batch is
    collected to a q×d float64 matrix (bounded by contract — the same
    bound the broadcast path needs) and closed over by a ``mapInPandas``
    stage that scores each Arrow batch of the corpus with ONE BLAS
    matmul and emits only its LOCAL top-k per query. Per corpus
    partition only ``k·q`` rows survive to the global ``row_number``
    merge — the shuffle is O(partitions·k·q), never O(corpus). A
    partition-local top-k under a total order (sim desc, id asc) is a
    superset of the global top-k, so the merge is exact. Cosine is
    computed in float64; callers that need cross-engine value equality
    round to ≤6 decimals (the registry's knn query rounds to 4), which
    absorbs summation-order differences vs a sequential loop.

    ``arrow=False``: pure-JVM expression path (``zip_with`` +
    ``aggregate``) — bit-identical to a sequential-loop oracle, but
    higher-order-function lambdas evaluate interpreted per element, so
    the inner loop is ~100× slower than the matmul. Kept for
    environments without Arrow/pandas and for bit-parity checks.

    ``max_collect_queries`` bounds the arrow path's driver-side
    collect: a query side larger than the bound silently OOMing the
    driver before any task runs is the failure mode this guards. Above
    the bound the call falls back to the broadcast-crossJoin path,
    where the query side stays a distributed relation and the JVM's own
    broadcast-size limit is the backstop. The probe is a
    ``limit(bound+1).count()`` — one bounded action, never a full
    count of the query side. A query set past tens of thousands is the
    wrong shape for brute force regardless — use ``lsh_topk`` /
    ``ivf_topk``.

    Norms are precomputed per ROW on each side of the join, so the
    per-PAIR work is one dot product — ``cosine_similarity`` inline
    would re-derive both norms (and the double-cast) for every pair,
    tripling the O(corpus × queries) inner-loop cost. Projections below
    the join are not inlined across it, so the norm really is computed
    once per row.
    """
    from pyspark.sql import Window

    if arrow:
        over_bound = (
            queries.limit(max_collect_queries + 1).count()
            > max_collect_queries
        )
        if over_bound:
            arrow = False  # fall back to the distributed-relation path
    if arrow:
        scored = _arrow_scored_local_topk(
            corpus, queries, k, id_col, vec_col, query_id_col
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("cosine_sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _to_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (F.col("__cn") * F.col("__qn"))
            ).alias("cosine_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _arrow_scored_local_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Per-Arrow-batch exact cosine scoring with local top-k pruning.

    Emits at most ``k`` rows per (query, corpus batch) — the candidate
    superset the caller's global ``row_number`` reduces exactly.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    if q_mat.size:
        q_unit = _unit_rows(q_mat)
    else:
        q_unit = q_mat

    out_schema = StructType(
        [
            StructField(
                query_id_col, queries.schema[id_col].dataType, True
            ),
            StructField(
                "neighbor_id", corpus.schema[id_col].dataType, True
            ),
            StructField("cosine_sim", DoubleType(), True),
        ]
    )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty or not len(q_ids):
                continue
            ids = pdf[id_col].to_numpy()
            c_mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            c_unit = _unit_rows(c_mat)
            sims = c_unit @ q_unit.T  # (batch, q)
            take = min(k, len(ids))
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j].copy()
                col[ids == qid] = -np.inf  # self-match excluded
                # total order (sim desc, neighbor_id asc): primary key
                # last in lexsort
                order = np.lexsort((ids, -col))[:take]
                order = order[np.isfinite(col[order])]
                out_q.extend([qid] * len(order))
                out_n.extend(ids[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {
                    query_id_col: out_q,
                    "neighbor_id": out_n,
                    "cosine_sim": out_s,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, out_schema)


def _hyperplanes(num_planes: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic unit-ish random hyperplanes (driver-side constants;
    num_planes × dim floats — a few KB broadcast into the plan)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(num_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (Charikar, STOC 2002): sign bit
    per plane packed into a long. Narrow map, no shuffle; cosine-similar
    vectors collide with probability (1 - θ/π)^planes.

    The planes×dim literal tree is generated as one SQL string (single
    ``expr`` round-trip) — building it Column-by-Column costs ~1 py4j
    call per literal, which at 12×64 literals is ~1 s of driver latency
    before the job starts."""
    planes = _hyperplanes(num_planes, dim, seed)
    terms = []
    for i, plane in enumerate(planes):
        arr = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in plane)
        dot_sql = (
            f"aggregate(zip_with(__v, array({arr}), (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        )
        terms.append(f"IF({dot_sql} > 0D, shiftleft(1L, {i}), 0L)")
    return (
        df.withColumn("__v", _to_double(F.col(vec_col)))
        .withColumn(out_col, F.expr(" | ".join(terms)))
        .drop("__v")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: bucket both sides with the same
    hyperplanes, equi-join on bucket, exact re-rank within buckets.

    Multi-probe (``multiprobe_bits=1``): each query also probes every
    bucket at Hamming distance 1 from its own — the standard recall
    boost that costs ``num_planes`` extra probe keys per query (cheap:
    the probe list is query-side, the corpus is never duplicated).
    Shuffles only (bucket, id, vector) for matching buckets — at 100 TB
    the join key balance is the thing to watch (AQE skew-join handles
    hot buckets); ``num_planes`` should grow with log2(corpus/target
    bucket size)."""
    bc = (
        with_lsh_bucket(corpus, vec_col, num_planes, dim, seed)
        .select(
            F.col(id_col).alias("neighbor_id"),
            _to_double(F.col(vec_col)).alias("__cv"),
            "lsh_bucket",
        )
        .withColumn("__cn", l2_norm(F.col("__cv")))
    )
    bq0 = (
        with_lsh_bucket(queries, vec_col, num_planes, dim, seed)
        .select(
            F.col(id_col).alias(query_id_col),
            _to_double(F.col(vec_col)).alias("__qv"),
            "lsh_bucket",
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
    )
    if multiprobe_bits >= 1:
        probes = [F.col("lsh_bucket")] + [
            F.col("lsh_bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(num_planes)
        ]
        bq = bq0.withColumn(
            "lsh_bucket", F.explode(F.array(*probes))
        )
    else:
        bq = bq0
    scored = (
        bc.join(F.broadcast(bq), "lsh_bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (F.col("__cn") * F.col("__qn"))
            ).alias("cosine_sim"),
        )
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _unit_rows(mat):
    """Row-normalize a matrix; zero rows pass through unscaled."""
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def _nearest_cells(
    df: DataFrame,
    cen_unit,
    topn: int,
    id_col: str,
    vec_col: str,
    out_id_col: str,
    with_sim: bool = False,
) -> DataFrame:
    """Assign each row its ``topn`` nearest centroid cells by cosine.

    One ``mapInPandas`` pass: each Arrow batch is scored against the
    (small, closure-captured) unit-centroid matrix with a single BLAS
    matmul — the fix for the r1 verdict's perf flag, where assignment
    was a corpus×centroids crossJoin evaluating an interpreted
    ``zip_with``/``aggregate`` lambda per pair. Ties break toward the
    lower cell index (stable argsort), matching a (sim desc, cell asc)
    ordering. Emits ``(out_id_col, __v double-array, cell)``; the
    corpus is scanned once and never shuffled here.
    """
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    fields = [
        StructField(out_id_col, df.schema[id_col].dataType, True),
        StructField("__v", ArrayType(DoubleType()), True),
        StructField("cell", IntegerType(), True),
    ]
    if with_sim:
        fields.append(StructField("sim", DoubleType(), True))
    out_schema = StructType(fields)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            sims = _unit_rows(mat) @ cen_unit.T
            take = min(topn, cen_unit.shape[0])
            order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            n = len(pdf)
            cols = {
                out_id_col: pdf[id_col].to_numpy().repeat(take),
                "__v": [
                    mat[i].tolist() for i in range(n) for _ in range(take)
                ],
                "cell": order.astype("int32").reshape(-1),
            }
            if with_sim:
                cols["sim"] = np.take_along_axis(sims, order, axis=1).reshape(
                    -1
                )
            yield pd.DataFrame(cols)

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def train_ivf_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    track_inertia: bool = False,
):
    """Spherical k-means centroids as a num_centroids×dim float64 matrix.

    Seeds are the ``num_centroids`` lowest-id corpus vectors
    (deterministic); each Lloyd iteration is distributed dataflow:
    assignment is the Arrow-matmul scan of :func:`_nearest_cells`, the
    per-cell mean is one ``groupBy(cell).applyInPandas`` (a single
    shuffle keyed by cell), and only the K×dim centroid matrix — never
    corpus rows — returns to the driver, which is the same bounded
    per-round action discipline as ``graph.connected_components``.
    Empty cells keep their previous centroid. At 100 TB you train on a
    sampled corpus (standard IVF practice) and assign over the full
    corpus; both stages share this code path.

    With ``track_inertia=True`` returns ``(centroids, inertias)`` where
    ``inertias[t]`` is the spherical-k-means objective Σ(1 − cos(x,
    c_assigned)) measured at iteration ``t``'s assignment pass (i.e.
    under the centroids produced by update ``t−1``). Lloyd's algorithm
    guarantees the sequence is non-increasing: assignment maximizes each
    row's cosine, and the cell-mean update maximizes Σcos for fixed
    assignments (Σ⟨x, c⟩ ≤ ‖Σx‖ with equality at c = unit(mean)). The
    per-cell sim sums ride the SAME single action as the cell means —
    tracking adds zero extra passes over the corpus.

    r17 (guide §2.3/§4.1 — the ``train_pq_codebooks`` discipline,
    ported): each Lloyd round is ONE ``mapInPandas`` scan that assigns
    the batch with a single BLAS matmul and pre-aggregates
    ``(vec sum, count, sim sum)`` PER CELL PER TASK, so the shuffle
    carries at most ``partitions × num_centroids`` tiny partial rows
    and the driver collects ``num_centroids`` finals. The previous
    shape (assignment pass emitting every row, then
    ``groupBy(cell).applyInPandas`` of the means) crossed the Arrow
    boundary twice and shuffled the FULL corpus vectors once per
    round — pure overhead, since the update only needs the per-cell
    sufficient statistics. Assignment ties break toward the lower cell
    index (``np.argmax`` takes the first maximum), matching
    ``_nearest_cells``' stable ordering, so cell assignments are
    unchanged; cell means differ from the old path only by float
    summation order.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    seed_rows = (
        corpus.orderBy(id_col).limit(num_centroids).select(vec_col).collect()
    )
    cen = np.asarray([r[0] for r in seed_rows], dtype=np.float64)
    k, dim = cen.shape

    part_schema = StructType(
        [
            StructField("cell", IntegerType(), True),
            StructField("vsum", ArrayType(DoubleType()), True),
            StructField("n", LongType(), True),
            StructField("sum_sim", DoubleType(), True),
        ]
    )

    inertias: list[float] = []
    for _ in range(max(0, iters)):
        cu = _unit_rows(cen)

        def partial_sums(batches, cu=cu):
            # Per-TASK accumulators: K×dim raw-vector sums, counts,
            # cosine sums — constant memory, amortized over every
            # batch in the partition (guide §4.5).
            sums = np.zeros((k, dim))
            ns = np.zeros(k, dtype=np.int64)
            sims = np.zeros(k)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                sc = _unit_rows(mat) @ cu.T
                cell = np.argmax(sc, axis=1)
                for c in np.unique(cell):
                    sel = cell == c
                    sums[c] += mat[sel].sum(axis=0)
                    ns[c] += int(sel.sum())
                    sims[c] += float(sc[sel, c].sum())
            live = np.flatnonzero(ns)
            if live.size:
                yield pd.DataFrame(
                    {
                        "cell": live.astype("int32"),
                        "vsum": [sums[c].tolist() for c in live],
                        "n": ns[live],
                        "sum_sim": sims[live],
                    }
                )

        new_rows = (
            corpus.select(vec_col)
            .mapInPandas(partial_sums, part_schema)
            .groupBy("cell")
            .agg(
                F.array(
                    *[F.sum(F.col("vsum")[i]) for i in range(dim)]
                ).alias("vsum"),
                F.sum("n").alias("n"),
                F.sum("sum_sim").alias("sum_sim"),
            )
            .collect()  # bounded: ≤ num_centroids rows of dim doubles
        )
        if track_inertia:
            n_total = sum(r["n"] for r in new_rows)
            sim_total = sum(r["sum_sim"] for r in new_rows)
            inertias.append(float(n_total) - sim_total)
        for r in new_rows:
            if r["n"]:
                cen[r["cell"]] = (
                    np.asarray(r["vsum"], dtype=np.float64) / r["n"]
                )
    if track_inertia:
        return cen, inertias
    return cen


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_iters: int = 2,
) -> DataFrame:
    """IVF ANN (the inverted-file scheme of Jégou/Douze/Schmid, TPAMI
    2011, without PQ compression): spherical-k-means centroids
    (``train_iters`` Lloyd rounds; 0 keeps the deterministic lowest-id
    seeds), corpus rows assigned to their nearest cell by one
    Arrow-matmul scan, each query probing its ``nprobe`` nearest cells,
    exact cosine re-rank within the probed cells only. Corpus-side cost
    is one scan + a cell-keyed broadcast join — the corpus is never
    duplicated and never all-pairs scored."""
    cen_unit = _unit_rows(
        train_ivf_centroids(
            corpus, num_centroids, train_iters, id_col, vec_col
        )
    )
    cells = _nearest_cells(
        corpus, cen_unit, 1, id_col, vec_col, id_col
    ).select(id_col, F.col("__v").alias(vec_col), "cell")
    return _ivf_cell_search(
        cells, cen_unit, queries, k, nprobe, id_col, vec_col,
        query_id_col,
    )


def ivf_store(
    corpus: DataFrame,
    num_centroids: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the PERSISTABLE IVF index: ``(cells_df, centroids_df)``
    where ``cells_df`` is the corpus with its nearest-cell assignment
    appended (``(id, vec, cell int)`` — write it as parquet
    PARTITIONED BY cell and every future search scans only the probed
    cells' files) and ``centroids_df`` is the ``num_centroids`` unit
    centroid rows ``(cell int, centroid array<double>)``. The IVF twin
    of :func:`pq_store` (train once — on a sample at 100 TB — then
    assign/search forever): a new ingest batch appends its own cell
    assignments via one Arrow-matmul scan against the saved centroids
    without touching existing rows."""
    cen_unit = _unit_rows(
        train_ivf_centroids(
            corpus, num_centroids, train_iters, id_col, vec_col
        )
    )
    cells = _nearest_cells(
        corpus, cen_unit, 1, id_col, vec_col, id_col
    ).select(id_col, F.col("__v").alias(vec_col), "cell")
    spark = corpus.sparkSession
    centroids_df = spark.createDataFrame(
        [(i, cen_unit[i].tolist()) for i in range(cen_unit.shape[0])],
        "cell int, centroid array<double>",
    )
    return cells, centroids_df


def ivf_search_store(
    cells_df: DataFrame,
    centroids_df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe a persisted IVF index from :func:`ivf_store`: the bounded
    centroid table is the only collect; each query batch is assigned
    its ``nprobe`` nearest cells by one Arrow matmul and broadcast
    into the cell-keyed join, so the corpus-side scan touches only the
    probed cells (with the cells table written partitioned-by-cell,
    that is literal partition pruning at 100 TB). Same result contract
    as :func:`ivf_topk` over the same centroids."""
    import numpy as np

    rows = centroids_df.collect()  # bounded: num_centroids rows
    cen_unit = np.zeros(
        (1 + max(r["cell"] for r in rows), len(rows[0]["centroid"]))
    )
    for r in rows:
        cen_unit[r["cell"]] = r["centroid"]
    return _ivf_cell_search(
        cells_df, cen_unit, queries, k, nprobe, id_col, vec_col,
        query_id_col,
    )


def _ivf_cell_search(
    cells: DataFrame,
    cen_unit,
    queries: DataFrame,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared IVF search tail: broadcast the probe assignments into the
    cell-keyed join, exact cosine re-rank within probed cells only."""
    from pyspark.sql import Window

    cell_side = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        "cell",
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    probes = _nearest_cells(
        queries, cen_unit, nprobe, id_col, vec_col, query_id_col
    ).select(
        query_id_col,
        F.col("__v").alias("__qv"),
        "cell",
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    scored = (
        cell_side.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            (
                dot(F.col("__cv"), F.col("__qv"))
                / (F.col("__cn") * F.col("__qn"))
            ).alias("cosine_sim"),
        )
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus,
    compare only within buckets (plus the all-pairs fallback is what
    this avoids), keep pairs above ``threshold``. Returns
    ``(a, b, cosine_sim)`` with a < b."""
    b = (
        with_lsh_bucket(df, vec_col, num_planes, dim, seed)
        .select(
            F.col(id_col).alias("__id"),
            _to_double(F.col(vec_col)).alias("__dv"),
            "lsh_bucket",
        )
        .withColumn("__n", l2_norm(F.col("__dv")))
        # Materialize once: both self-join sides read the bucketed
        # projection instead of each re-running the planes×dim
        # hyperplane expression (the same share-across-join-sides
        # discipline as dedup.minhash signatures).
        .localCheckpoint(eager=False)
    )
    pairs = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.lsh_bucket") == F.col("y.lsh_bucket"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("a"),
            F.col("y.__id").alias("b"),
            (
                dot(F.col("x.__dv"), F.col("y.__dv"))
                / (F.col("x.__n") * F.col("y.__n"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    return pairs


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: each vector is scaled by
    ``127 / max|x_i|`` and rounded, the standard storage/bandwidth
    compression for ANN corpora (4× smaller than float32; dot products
    run in int arithmetic with one final rescale). Keeps ``scale_col``
    so ``q / scale`` reconstructs within half a quantization step
    (``max|x| / 254``) per component.

    Pure row-local JVM expressions — no UDF, no shuffle, codegen'd;
    rounding is the engine-portable ``floor(x·s + 0.5)`` (half toward
    +inf in both Spark and DuckDB, so results are bit-identical across
    engines). Zero vectors quantize to zeros under a guarded scale.
    """
    mx = F.array_max(
        F.transform(vec_col, lambda v: F.abs(v.cast("double")))
    )
    sc = F.lit(127.0) / F.greatest(mx, F.lit(1e-30))
    out = df.withColumn(scale_col, sc)
    q = F.transform(
        vec_col,
        lambda v: F.floor(v.cast("double") * F.col(scale_col) + F.lit(0.5))
        .cast("int"),
    )
    return out.withColumn(q_col, q)


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    num_cells: int = 10,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): cluster the
    embedding corpus with spherical k-means, then compare pairs ONLY
    within each cluster cell — semantic near-duplicates concentrate in
    cells, so the quadratic comparison is confined to cell-sized
    blocks instead of the corpus. Complementary to
    :func:`embedding_near_dup_pairs`' hyperplane buckets: random
    hyperplanes can split a dense semantic cluster across buckets,
    trained centroids by construction do not split what they model.
    Returns ``(a, b, cosine_sim, cell)`` with ``a < b``.

    Scale shape: centroid training is bounded driver work
    (``train_ivf_centroids``), assignment is one Arrow-matmul scan,
    and the self-join shuffles each row once on its cell key;
    identical vectors always share a cell (same cosines → same
    argmax under the deterministic tie-break), so EXACT duplicates
    are never missed — the recall floor the contract query pins."""
    cen_unit = _unit_rows(
        train_ivf_centroids(df, num_cells, train_iters, id_col, vec_col)
    )
    cells = (
        _nearest_cells(df, cen_unit, 1, id_col, vec_col, "__id")
        .select("__id", F.col("__v").alias("__dv"), "cell")
        .withColumn("__n", l2_norm(F.col("__dv")))
        .localCheckpoint(eager=False)  # both self-join sides reuse it
    )
    return (
        cells.alias("x")
        .join(
            cells.alias("y"),
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("a"),
            F.col("y.__id").alias("b"),
            (
                dot(F.col("x.__dv"), F.col("y.__dv"))
                / (F.col("x.__n") * F.col("y.__n"))
            ).alias("cosine_sim"),
            F.col("x.cell").alias("cell"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Distributed Gram matrix ``G = Σ_rows v vᵀ`` of an embedding
    column, returned as ``(i, j, gv)`` with 1-based dimension indices.

    This is the sufficient statistic for every second-moment method
    over embeddings — PCA / top-component power iteration, whitening,
    linear probes: the corpus is reduced to a d×d matrix in ONE scan
    and never touched again. Each Arrow batch contributes a
    partition-local ``XᵀX`` (one float64 matmul), so only d² doubles
    per partition cross the wire and the shuffle reduces
    partitions·d² rows to d² — the same map-side-combine shape as
    ``price_quantity_ols``, just matrix-valued. Elements are cast
    float32→float64 BEFORE multiplying, matching an oracle that
    casts then multiplies.
    """
    import numpy as np
    import pandas as pd

    def part(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(
                [
                    np.asarray(a, dtype=np.float64)
                    for a in pdf[vec_col]
                ]
            )
            G = X.T @ X
            acc = G if acc is None else acc + G
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(
                np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "gv": acc.ravel(),
                }
            )

    return (
        df.select(vec_col)
        .mapInPandas(part, "i int, j int, gv double")
        .groupBy("i", "j")
        .agg(F.sum("gv").alias("gv"))
    )


def power_iteration_top_component(
    gram: DataFrame, dim: int, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Lazy power iteration for the dominant eigenvector of a d×d Gram
    table ``(i, j, gv)``. Returns ``(v, lam)``: ``v`` = ``(vi, val)``
    unit eigenvector estimate after ``iters`` rounds from the uniform
    start vector, ``lam`` = 1-row ``(nm)`` — ‖G·v_{k-1}‖, the Rayleigh
    estimate of λ₁.

    All model-side work happens on d-row / d²-row tables (the Gram is
    the only corpus-derived input), so every join below broadcasts and
    the whole iteration is driver-free and lazy — the IVF-centroid
    pattern without even the bounded collect. ``localCheckpoint`` per
    round keeps the plan linear in ``iters``.
    """
    g = gram.localCheckpoint(eager=False)  # reused by every round
    v = None
    lam = None
    for _ in range(iters):
        if v is None:
            mv = g.groupBy("i").agg(
                (F.sum(F.col("gv")) / float(math.sqrt(dim))).alias("mv")
            )
        else:
            mv = (
                g.join(F.broadcast(v), g["j"] == v["vi"])
                .groupBy("i")
                .agg(F.sum(F.col("gv") * F.col("val")).alias("mv"))
            )
        lam = mv.agg(
            F.sqrt(F.sum(F.col("mv") * F.col("mv"))).alias("nm")
        )
        v = (
            mv.crossJoin(F.broadcast(lam))
            .select(
                F.col("i").alias("vi"),
                (F.col("mv") / F.col("nm")).alias("val"),
            )
            .localCheckpoint(eager=False)
        )
    return v, lam


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Per-subspace k-means codebooks for product quantization (Jégou/
    Douze/Schmid TPAMI 2011 §II): split each unit-normalized vector
    into ``m`` contiguous subvectors and learn ``k_codes`` centroids
    per subspace. Returns an ``(m, k_codes, dim/m)`` float64 array.

    Seeds are the ``k_codes`` lowest-id corpus rows' subvectors
    (deterministic, like ``train_ivf_centroids``). Each Lloyd round is
    ONE ``mapInPandas`` scan that assigns every row's ``m`` subvectors
    to their L2-nearest codes and pre-aggregates (sum, count) per
    (subspace, code) WITHIN the Arrow batch — so the shuffle carries at
    most ``partitions × m × k_codes`` tiny partial rows and the driver
    collects the ``m × k_codes`` final sums: corpus rows never shuffle
    and never reach the driver. At 100 TB you train on a sample and
    encode the full corpus; both use this path.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    seed_rows = (
        corpus.orderBy(id_col).limit(k_codes).select(vec_col).collect()
    )
    if not seed_rows:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    # A corpus smaller than k_codes trains (and returns) that many
    # codes — downstream shapes all derive from books.shape, never the
    # requested k_codes.
    seed = np.asarray([r[0] for r in seed_rows], dtype=np.float64)
    seed = _unit_rows(seed)
    dim = seed.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # books[j] : (k_codes, sub) — subspace j's codebook
    books = np.stack(
        [seed[:, j * sub : (j + 1) * sub].copy() for j in range(m)]
    )

    part_schema = StructType(
        [
            StructField("sub", IntegerType(), True),
            StructField("code", IntegerType(), True),
            StructField("vsum", ArrayType(DoubleType()), True),
            StructField("n", LongType(), True),
        ]
    )

    for _ in range(max(0, iters)):
        bks = books.copy()

        def partial_sums(batches, bks=bks):
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                mat = _unit_rows(mat)
                rows = []
                for j in range(m):
                    x = mat[:, j * sub : (j + 1) * sub]  # (n, sub)
                    # L2-nearest code: argmax <x,c> - |c|^2/2
                    score = x @ bks[j].T - 0.5 * (bks[j] ** 2).sum(1)
                    code = np.argmax(score, axis=1)
                    for c in np.unique(code):
                        sel = x[code == c]
                        rows.append(
                            (j, int(c), sel.sum(0).tolist(), len(sel))
                        )
                yield pd.DataFrame(
                    rows, columns=["sub", "code", "vsum", "n"]
                )

        agg = (
            corpus.select(vec_col)
            .mapInPandas(partial_sums, part_schema)
            .groupBy("sub", "code")
            .agg(
                F.array(
                    *[
                        F.sum(F.col("vsum")[i]).alias(f"s{i}")
                        for i in range(sub)
                    ]
                ).alias("vsum"),
                F.sum("n").alias("n"),
            )
            .collect()  # bounded: ≤ m × k_codes rows of sub doubles
        )
        for r in agg:
            if r["n"]:
                books[r["sub"], r["code"]] = (
                    np.asarray(r["vsum"], dtype=np.float64) / r["n"]
                )
    return books


def pq_encode(
    df: DataFrame,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Encode each row as ``m`` small int codes (the compressed corpus
    representation a PQ deployment PERSISTS: 8 codes ≈ 8 bytes vs a
    64-float32 embedding's 256 — a ~32× smaller scan for every
    subsequent query). Row-local ``mapInPandas``; rows are
    unit-normalized before quantization so ADC inner products
    approximate cosine."""
    import numpy as np
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m, _, sub = books.shape
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField(code_col, ArrayType(IntegerType()), True),
        ]
    )
    half_sq = 0.5 * (books**2).sum(axis=2)  # (m, k_codes)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            mat = _unit_rows(mat)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                x = mat[:, j * sub : (j + 1) * sub]
                codes[:, j] = np.argmax(x @ books[j].T - half_sq[j], axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], code_col: list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(encode, out_schema)


class QueryBatchTooLarge(ValueError):
    """The query side exceeds the driver-collect bound of a
    collect-the-queries ANN path. Raised BEFORE any collect happens —
    the alternative is a silent driver OOM. Callers hitting this should
    batch their query set (signatures and codes are immutable, so
    chunked calls compose exactly) or drop to ``lsh_topk``/``ivf_topk``
    whose query side stays distributed."""


def _broadcast_threshold_bytes(spark) -> int:
    """Parse ``spark.sql.autoBroadcastJoinThreshold`` (plain bytes or a
    b/k/m/g-suffixed size; -1 = broadcast disabled) into bytes."""
    raw = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1),
    ):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return 10 << 20


def _pick_over_bound_path(
    on_over_bound: str,
    spark,
    m: int,
    k_codes: int,
    n_queries: int,
) -> str:
    """Resolve 'chunk'/'broadcast' for an over-bound query set.
    ``'chunk'`` auto-upgrades to the broadcast search when the LUT
    table (one m·k_codes float64 array per query) fits the session's
    broadcast threshold — one scan of the codes instead of a serial
    per-chunk loop; explicit ``'broadcast'`` skips the size check
    (the JVM's own broadcast limit is then the backstop). The caller
    supplies ``n_queries`` (counted ONCE in ``_pq_dispatch`` and
    shared with the chunked path) so routing never re-runs an action
    over an arbitrarily large query set."""
    if on_over_bound != "chunk":
        return on_over_bound
    lut_bytes = n_queries * (m * k_codes * 8 + 32)  # array + row overhead
    threshold = _broadcast_threshold_bytes(spark)
    return "broadcast" if 0 < lut_bytes <= threshold else "chunk"


#: Valid ``on_over_bound`` policies for the PQ search entry points.
#: Validated up front so a typo ('chunked', 'broadcast!') fails fast
#: instead of silently degrading to the error path.
_OVER_BOUND_POLICIES = ("error", "chunk", "broadcast")


def _check_over_bound_policy(on_over_bound: str) -> None:
    if on_over_bound not in _OVER_BOUND_POLICIES:
        raise ValueError(
            f"on_over_bound must be one of {_OVER_BOUND_POLICIES}, "
            f"got {on_over_bound!r}"
        )


def _check_query_bound(
    queries: DataFrame, max_collect_queries: int
) -> bool:
    """Bounded probe (``limit(bound+1).count()`` — one action, never a
    full count) of whether a query batch fits the driver-collect
    contract. Returns True when over the bound."""
    return (
        queries.limit(max_collect_queries + 1).count()
        > max_collect_queries
    )


def _pq_chunked_topk(
    encoded: DataFrame,
    books,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    max_collect_queries: int,
    n_queries: int | None = None,
    _salt: int = 0,
    _depth: int = 0,
) -> DataFrame:
    """Over-bound PQ search by hash-chunking the query side: split the
    queries into ~0.8·bound-sized chunks on ``pmod(xxhash64(id,
    salt))`` (no global sort — a ``row_number`` chunking would funnel
    the whole query side through one task), then run the bounded ADC
    search per chunk and union lazily. Each chunk costs one bounded
    collect plus one scan of the CODE table (~32× smaller than the
    embeddings), so a 10×-over-bound query set costs ~13 cheap scans
    instead of a driver OOM; per-chunk results compose exactly because
    codes and codebooks are immutable. The query table and code table
    are localCheckpointed once so neither's upstream plan re-executes
    per chunk. ``n_queries`` is the caller's already-counted query-side
    size (``_pq_dispatch`` counts once for routing + chunking); when
    absent (direct calls, recursion) the count runs here.

    Chunks are ~uniform in expectation, but the hash could still land
    >bound ids in one chunk; such a chunk RE-CHUNKS recursively under a
    fresh hash salt (changing the salt re-randomizes the assignment —
    re-splitting on the same hash would put the whole chunk in one
    sub-chunk). DUPLICATE query-id values defeat this: xxhash64(id,
    salt) keeps equal ids together under every salt, so >bound copies
    of one id would recurse forever — the depth cap converts that into
    a clear error instead."""
    import math as _math

    if _depth > 3:
        raise QueryBatchTooLarge(
            "pq chunked top-k: a hash chunk stayed over "
            f"max_collect_queries={max_collect_queries} after "
            f"{_depth} re-chunks under fresh salts. Re-salting "
            "separates distinct ids with overwhelming probability, so "
            "this almost certainly means one query id value has more "
            "than the bound's worth of DUPLICATE rows — equal ids land "
            "in the same chunk under every salt. De-duplicate the "
            "query side on the id column (or raise "
            "max_collect_queries) and retry."
        )
    n = queries.count() if n_queries is None else n_queries
    n_chunks = max(2, _math.ceil(n / (max_collect_queries * 0.8)))
    q = queries.select(id_col, vec_col).withColumn(
        "__chunk",
        F.pmod(F.xxhash64(F.col(id_col), F.lit(_salt)), F.lit(n_chunks)),
    ).localCheckpoint(eager=False)
    enc = encoded.localCheckpoint(eager=False)
    parts = []
    for i in range(n_chunks):
        chunk = q.where(F.col("__chunk") == i).drop("__chunk")
        try:
            parts.append(
                _pq_adc_topk(
                    enc, books, chunk, k,
                    id_col, vec_col, query_id_col, max_collect_queries,
                )
            )
        except QueryBatchTooLarge:
            parts.append(
                _pq_chunked_topk(
                    enc, books, chunk, k,
                    id_col, vec_col, query_id_col, max_collect_queries,
                    _salt=_salt + 1, _depth=_depth + 1,
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pq_broadcast_topk(
    encoded: DataFrame,
    books,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Over-bound PQ search with the query side DISTRIBUTED: each query
    row derives its ADC lookup table locally (``lut[j·k_codes + c] =
    <q_sub_j, books[j, c]>`` — one Arrow pass, no collect), the LUT
    table broadcast-joins the code scan, and the JVM computes every
    score as ``m`` array lookups (``aggregate`` over the code array —
    same float64 accumulation order as the numpy path, so results are
    bit-identical to the chunked search). One scan of the compressed
    codes regardless of query count — the fix for the chunked path's
    serial per-chunk scans when the query set, while over the
    driver-collect bound, still fits the broadcast threshold
    (``pq_topk`` checks ~LUT bytes vs
    ``spark.sql.autoBroadcastJoinThreshold`` before choosing this
    path).

    Cost shape: the scored relation is codes × queries rows BEFORE the
    per-query top-k window prunes it, so the top-k shuffle is
    O(corpus·q) — fine when q·corpus pairs fit a shuffle (the regime
    this path targets); for query sets beyond the broadcast threshold
    the chunked path's bounded collects are the safe fallback."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    m, k_codes, sub = books.shape

    lut_schema = StructType(
        [
            StructField(
                query_id_col, queries.schema[id_col].dataType, True
            ),
            StructField("__lut", ArrayType(DoubleType()), True),
        ]
    )

    def make_luts(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            mat = _unit_rows(mat)
            # (n, m, k_codes) flattened row-major to m*k_codes per row
            luts = np.stack(
                [
                    mat[:, j * sub : (j + 1) * sub] @ books[j].T
                    for j in range(m)
                ],
                axis=1,
            ).reshape(len(pdf), m * k_codes)
            yield pd.DataFrame(
                {query_id_col: pdf[id_col], "__lut": list(luts)}
            )

    luts = queries.select(id_col, vec_col).mapInPandas(
        make_luts, lut_schema
    )

    sim = F.aggregate(
        F.zip_with(
            F.col("pq_codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at(
                F.col("__lut"), (j * k_codes + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # NB: this JVM fold accumulates the m LUT entries strictly left to
    # right. The numpy ADC path mirrors it with an explicit per-subspace
    # sequential fold (NOT ndarray.sum, whose n>=8 unrolled 8-accumulator
    # reduction differs in the last ulp), so both paths produce
    # bit-identical sims and the k-boundary row_number ties break the
    # same way regardless of which path dispatch picked.
    scored = (
        encoded.select(F.col(id_col).alias("neighbor_id"), "pq_codes")
        .join(F.broadcast(luts), F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", sim.alias("adc_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_collect_queries: int = 65536,
    on_over_bound: str = "error",
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC): queries stay
    exact, the corpus is scored from its codes via per-query lookup
    tables ``lut[j, c] = <q_j, books[j, c]>`` so each corpus row costs
    ``m`` table lookups instead of a ``dim``-wide dot product — and,
    decisively for 100 TB, the scoring scan reads the ~32×-compressed
    code table, never the embeddings. Returns ``(query_id,
    neighbor_id, rank, adc_sim)``; ADC sims approximate cosine (rows
    are unit-normalized before encoding), so ranks are approximate —
    verify recall against ``brute_force_topk``, as
    ``knn_pq_recall_check`` does.

    The query side is collected driver-side, bounded by
    ``max_collect_queries`` with the same probe as
    ``brute_force_topk``'s arrow path. An over-bound query side either
    raises :class:`QueryBatchTooLarge` before collecting anything
    (``on_over_bound='error'``, the default) or searches WITHOUT the
    big collect (``on_over_bound='chunk'``): per-query LUTs
    broadcast-joined to one scan of the compressed code table when the
    LUT table fits ``spark.sql.autoBroadcastJoinThreshold``
    (:func:`_pq_broadcast_topk` — the query side stays distributed),
    else hash-chunked bounded collects unioned per chunk
    (:func:`_pq_chunked_topk` — skew-safe via recursive re-chunking).
    ``on_over_bound='broadcast'`` forces the broadcast search. All
    paths return identical results and the driver never sees more
    than the bound. Per-partition local top-k keeps the bounded
    path's merge shuffle at O(partitions·k·q).
    """
    _check_over_bound_policy(on_over_bound)
    books = train_pq_codebooks(
        corpus, m, k_codes, train_iters, id_col, vec_col
    )
    encoded = pq_encode(corpus, books, id_col, vec_col)
    return _pq_dispatch(
        encoded, books, queries, k, id_col, vec_col,
        query_id_col, max_collect_queries, on_over_bound,
    )


def _pq_dispatch(
    encoded: DataFrame,
    books,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    max_collect_queries: int,
    on_over_bound: str,
) -> DataFrame:
    """Shared over-bound routing for :func:`pq_topk` /
    :func:`pq_search_store`: bounded ADC when the query set fits the
    driver-collect contract; otherwise the broadcast search (LUT table
    within the broadcast threshold, or forced) or the hash-chunked
    loop."""
    if on_over_bound != "error" and _check_query_bound(
        queries, max_collect_queries
    ):
        # One full count of the (over-bound) query side, shared by the
        # broadcast-vs-chunk routing AND the chunked path's chunk-count
        # math — neither re-runs an action over an arbitrary query set.
        n = queries.count()
        path = _pick_over_bound_path(
            on_over_bound, queries.sparkSession,
            books.shape[0], books.shape[1], n,
        )
        if path == "broadcast":
            return _pq_broadcast_topk(
                encoded, books, queries, k, id_col, vec_col, query_id_col
            )
        return _pq_chunked_topk(
            encoded, books, queries, k, id_col, vec_col,
            query_id_col, max_collect_queries, n_queries=n,
        )
    return _pq_adc_topk(
        encoded,
        books,
        queries,
        k,
        id_col,
        vec_col,
        query_id_col,
        max_collect_queries,
    )


def _pq_adc_topk(
    encoded: DataFrame,
    books,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    max_collect_queries: int = 65536,
) -> DataFrame:
    """ADC scoring of an already-encoded code table against a bounded
    query batch (shared by :func:`pq_topk` and
    :func:`pq_search_store`)."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql.types import DoubleType, StructField, StructType

    m, k_codes, sub = books.shape
    if _check_query_bound(queries, max_collect_queries):
        raise QueryBatchTooLarge(
            f"pq ADC top-k: query side exceeds max_collect_queries="
            f"{max_collect_queries}; pass on_over_bound='chunk' (the "
            f"hash-chunked search — per-chunk results compose "
            f"exactly), batch the queries yourself, or use a "
            f"distributed-query path (lsh_topk/ivf_topk)"
        )
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    if q_mat.size:
        q_mat = _unit_rows(q_mat)
    # luts[q, j, c] = <q_sub_j, books[j, c]>
    luts = np.stack(
        [
            np.stack(
                [
                    q_mat[:, j * sub : (j + 1) * sub] @ books[j].T
                    for j in range(m)
                ],
                axis=1,
            )
        ]
    )[0] if len(q_ids) else np.zeros((0, m, k_codes))

    out_schema = StructType(
        [
            StructField(query_id_col, queries.schema[id_col].dataType, True),
            StructField("neighbor_id", encoded.schema[id_col].dataType, True),
            StructField("adc_sim", DoubleType(), True),
        ]
    )
    jj = np.arange(m)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty or not len(q_ids):
                continue
            ids = pdf[id_col].to_numpy()
            codes = np.asarray(list(pdf["pq_codes"]), dtype=np.int64)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                # Explicit sequential fold over the m subspaces — the
                # same left-to-right order as the broadcast path's JVM
                # F.aggregate, so sims match that path bit-for-bit
                # (ndarray.sum would use numpy's 8-accumulator unrolled
                # reduction for m >= 8 and differ in the last ulp,
                # which can swap row_number ties at the k boundary).
                gathered = luts[qi][jj, codes]  # (n, m)
                sims = np.zeros(len(codes), dtype=np.float64)
                for j in range(m):
                    sims = sims + gathered[:, j]
                sims[ids == qid] = -np.inf
                take = min(k, len(ids))
                order = np.lexsort((ids, -sims))[:take]
                order = order[np.isfinite(sims[order])]
                out_q.extend([qid] * len(order))
                out_n.extend(ids[order])
                out_s.extend(sims[order])
            yield pd.DataFrame(
                {
                    query_id_col: out_q,
                    "neighbor_id": out_n,
                    "adc_sim": out_s,
                }
            )

    scored = encoded.mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def pq_store(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the PERSISTABLE PQ index: ``(codes_df, books_df)`` where
    ``codes_df`` is ``(id, pq_codes array<int>)`` — the ~32×-compressed
    corpus representation — and ``books_df`` is ``(sub int, code int,
    centroid array<double>)``, the ``m × k_codes`` codebook rows.
    Write both as parquet and every future query batch searches via
    :func:`pq_search_store` without touching the embedding column
    again (the PQ twin of ``dedup.minhash_store``): at 100 TB the hot
    index is a few bytes per vector plus a codebook that fits in one
    broadcast.

    Codes are row-local given the codebooks, so a new ingest batch
    appends its own codes without re-encoding the existing corpus —
    train once (on a sample), encode forever.
    """
    books = train_pq_codebooks(
        corpus, m, k_codes, train_iters, id_col, vec_col
    )
    codes_df = pq_encode(corpus, books, id_col, vec_col)
    spark = corpus.sparkSession
    # Enumerate from the TRAINED shape, not the requested k_codes: a
    # corpus with fewer rows than k_codes seeds (and returns) a
    # smaller codebook, and range(k_codes) would index past it.
    n_subs, n_codes = books.shape[0], books.shape[1]
    books_df = spark.createDataFrame(
        [
            (j, c, books[j, c].tolist())
            for j in range(n_subs)
            for c in range(n_codes)
        ],
        "sub int, code int, centroid array<double>",
    )
    return codes_df, books_df


def pq_search_store(
    codes_df: DataFrame,
    books_df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_collect_queries: int = 65536,
    on_over_bound: str = "error",
) -> DataFrame:
    """ADC top-k against a persisted PQ index from :func:`pq_store`.
    The codebook (``m × k_codes`` rows) is the only thing collected
    besides the query batch, which is bounded by
    ``max_collect_queries`` (over-bound raises
    :class:`QueryBatchTooLarge`, or searches via the broadcast /
    hash-chunked paths with ``on_over_bound='chunk'``/``'broadcast'``
    — see :func:`pq_topk`); the scan reads codes only."""
    import numpy as np

    _check_over_bound_policy(on_over_bound)
    rows = books_df.collect()  # bounded: m × k_codes centroid rows
    m = 1 + max(r["sub"] for r in rows)
    k_codes = 1 + max(r["code"] for r in rows)
    sub = len(rows[0]["centroid"])
    books = np.zeros((m, k_codes, sub))
    for r in rows:
        books[r["sub"], r["code"]] = r["centroid"]
    return _pq_dispatch(
        codes_df, books, queries, k, id_col, vec_col,
        query_id_col, max_collect_queries, on_over_bound,
    )


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
    sim_col: str = "cosine_sim",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell/Goldstein,
    SIGIR 1998): greedily pick ``k`` of each query's candidates
    maximizing ``lam·relevance − (1−lam)·max_similarity_to_already_
    picked`` — the diversity pass RAG retrieval runs AFTER ANN so the
    context window isn't k near-copies of the same passage.

    Scale shape: the expensive part (ANN) already happened; MMR runs
    per query over its BOUNDED candidate list (tens to hundreds of
    rows) via ``applyInPandas`` — one shuffle keyed on the query id,
    greedy loop in numpy inside each group, nothing quadratic in the
    corpus. Candidates join their embeddings first (hash join on the
    neighbor id; vectors move once, only for candidate rows).

    Ties break by ``neighbor_id`` so output is deterministic.
    Returns ``(query_id, neighbor_id, mmr_rank, mmr_score)``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    enriched = candidates.select(
        query_id_col, neighbor_id_col, sim_col
    ).join(
        corpus.select(
            F.col(id_col).alias(neighbor_id_col),
            _to_double(F.col(vec_col)).alias("__v"),
        ),
        neighbor_id_col,
    )
    out_schema = StructType(
        [
            StructField(
                query_id_col,
                candidates.schema[query_id_col].dataType,
                True,
            ),
            StructField(
                neighbor_id_col,
                candidates.schema[neighbor_id_col].dataType,
                True,
            ),
            StructField("mmr_rank", IntegerType(), True),
            StructField("mmr_score", DoubleType(), True),
        ]
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [sim_col, neighbor_id_col], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.asarray(list(pdf["__v"]), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        rel = pdf[sim_col].to_numpy(dtype=np.float64)
        ids = pdf[neighbor_id_col].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        remaining = np.ones(n, dtype=bool)
        max_sim = np.zeros(n)
        for _ in range(min(k, n)):
            mmr = lam * rel - (1.0 - lam) * max_sim
            mmr[~remaining] = -np.inf
            # deterministic argmax: best score, then lowest neighbor id
            best = np.lexsort((ids, -mmr))[0]
            picked.append(best)
            scores.append(float(mmr[best]))
            remaining[best] = False
            max_sim = np.maximum(max_sim, unit @ unit[best])
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[picked].to_numpy(),
                neighbor_id_col: ids[picked],
                "mmr_rank": np.arange(1, len(picked) + 1, dtype="int32"),
                "mmr_score": scores,
            }
        )

    return enriched.groupBy(query_id_col).applyInPandas(pick, out_schema)
