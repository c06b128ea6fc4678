"""Independent invariants for the r5b analytics batch: interval
overlap/concurrency, logistic training, entropy gate, k-anonymity,
and the Gram/power-iteration spectral path.

The oracle-parity suite already pins each query against its DuckDB
twin; these tests check the MATH against a second, non-SQL witness
(numpy eigendecomposition, a naive Spark inequality join, analytic
bounds) so an error shared by both the Spark and SQL formulations
would still be caught.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark import queries as q
from financial_data_pipeline_optimization_spark.operators import vector
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_CORRECTNESS, SF_SMOKE


def test_gram_matrix_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("embedding").collect()
    X = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in rows]
    )
    expected = X.T @ X
    got = np.zeros_like(expected)
    for r in vector.gram_matrix(emb).collect():
        got[r["i"] - 1, r["j"] - 1] = r["gv"]
    assert np.allclose(got, expected, rtol=1e-9)


def test_power_iteration_approaches_top_eigenvalue(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("embedding").collect()
    X = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in rows]
    )
    true_top = float(np.linalg.eigvalsh(X.T @ X)[-1])
    g = vector.gram_matrix(emb)
    _, lam = vector.power_iteration_top_component(g, X.shape[1], 3)
    est = lam.collect()[0]["nm"]
    # ‖G·v‖ for unit v never exceeds λ₁; three rounds from a uniform
    # start should already be within a modest factor of it.
    assert est <= true_top * (1 + 1e-9)
    assert est >= 0.5 * true_top


def test_interval_overlap_matches_naive_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")

    def side(pri, pre):
        return orders.where(
            F.col("o_orderpriority") == pri
        ).select(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1992-01-01")
            ).alias(f"{pre}sd")
        )

    naive = (
        side("1-URGENT", "a")
        .join(
            side("2-HIGH", "b"),
            (F.col("asd") <= F.col("bsd") + 3)
            & (F.col("bsd") <= F.col("asd") + 3),
        )
        .count()
    )
    bucketed = (
        q.q_interval_overlap_weekly(spark, SF_SMOKE)
        .agg(F.sum("n_pairs"))
        .collect()[0][0]
    )
    assert bucketed == naive and naive > 0


def test_concurrency_bounded_by_order_count(spark):
    out = q.q_order_window_concurrency(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    n_customers = orders.select("o_custkey").distinct().count()
    per_cust_max = (
        orders.groupBy("o_custkey").count().agg(F.max("count")).collect()
    )[0][0]
    assert sum(r["n_customers"] for r in out) == n_customers
    assert all(1 <= r["concurrent_orders"] <= per_cust_max for r in out)


def test_logistic_steps_reduce_log_loss(spark):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    pdf = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.log(F.lit(1.0) + F.col("n_chars")) / 10).alias("x1"),
        (
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
            ).cast("double")
            / F.length("text")
        ).alias("x2"),
    ).toPandas()
    out = q.q_logistic_quality_steps(spark, SF_CORRECTNESS).collect()[0]
    w = np.array([out["w_bias"], out["w_len"], out["w_space"]])
    Xm = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"].values, pdf["x2"].values]
    )
    y = pdf["y"].values
    p = 1.0 / (1.0 + np.exp(-(Xm @ w)))
    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    loss0 = -math.log(0.5)  # w = 0 predicts 0.5 everywhere
    assert loss < loss0
    assert out["n_docs"] == len(pdf)
    assert 0.0 <= out["train_acc"] <= 1.0


def test_entropy_within_four_class_bound(spark):
    out = q.q_entropy_quality_filter(spark, SF_CORRECTNESS)
    rows = out.collect()
    bound = math.log(4) + 1e-9
    assert all(0.0 <= r["char_entropy"] <= bound for r in rows)
    # The gate must separate: some docs kept, some dropped.
    kept = sum(1 for r in rows if r["keep"])
    assert 0 < kept < len(rows)


def test_k_anonymity_arithmetic(spark):
    out = q.q_k_anonymity_report(spark, SF_CORRECTNESS).collect()[0]
    cust = load_table(spark, SF_CORRECTNESS, "customer")
    assert out["n_rows"] == cust.count()
    assert out["min_group_size"] <= out["max_group_size"]
    assert out["suppressed_rows"] <= 6 * out["unsafe_groups"]
    assert out["unsafe_groups"] <= out["n_groups"]


@pytest.mark.parametrize(
    "name",
    [
        "interval_overlap_weekly",
        "order_window_concurrency",
        "logistic_quality_steps",
        "entropy_quality_filter",
        "k_anonymity_report",
        "pca_top_component",
    ],
)
def test_r5b_registered_with_oracle(name):
    specs = {s.name: s for s in q.registry()}
    assert name in specs and specs[name].oracle is not None


def test_psi_nonnegative_and_counts_partition_orders(spark):
    out = q.q_psi_drift_by_priority(spark, SF_CORRECTNESS).collect()
    orders = load_table(spark, SF_CORRECTNESS, "orders")
    assert len(out) == 5
    # Every PSI term (p_cur−p_ref)·ln(p_cur/p_ref) has matching signs,
    # so the index is nonnegative by construction.
    assert all(r["psi"] >= 0.0 for r in out)
    assert sum(r["n_ref"] + r["n_cur"] for r in out) == orders.count()


def test_kappa_consistent_with_confusion_matrix(spark):
    out = q.q_lang_agreement_kappa(spark, SF_CORRECTNESS).collect()[0]
    assert 0.0 <= out["po"] <= 1.0 and 0.0 <= out["pe"] <= 1.0
    assert out["kappa"] <= 1.0
    # κ must reproduce from its own published po/pe (self-consistency
    # of the emitted row, independent of either engine's internals).
    expect = (out["po"] - out["pe"]) / (1.0 - out["pe"])
    assert abs(out["kappa"] - expect) < 2e-4


def test_interval_overlap_rejects_reserved_cell_column(spark):
    """__cell is the grid-bucket working column — an input already
    carrying it would silently corrupt the join key, so the operator
    must reject it up front."""
    from financial_data_pipeline_optimization_spark.operators import joins

    a = spark.createDataFrame([(1, 5, 0)], "s1 int, e1 int, __cell int")
    b = spark.createDataFrame([(2, 6)], "s2 int, e2 int")
    with pytest.raises(ValueError, match="__cell"):
        joins.interval_overlap_join(a, b, "s1", "e1", "s2", "e2")
    with pytest.raises(ValueError, match="__cell"):
        joins.interval_overlap_join(
            b, a.withColumnRenamed("s1", "s3").withColumnRenamed("e1", "e3"),
            "s2", "e2", "s3", "e3",
        )
