"""Structured Streaming tests: drive each streaming op over the events
parquet with AvailableNow/memory sinks and check against the batch twin
computed on the same data (SURVEY.md §7.4's streaming-checkability rule).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_data_pipeline_optimization_spark import schemas, streaming
from financial_data_pipeline_optimization_spark.sources import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def events_stream_dir(spark):
    """Copy of events at sf0.001 re-written as µs timestamps so the
    streaming file source can read it with an explicit schema."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_counts_matches_batch(spark, events_stream_dir):
    stream = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    q = _run_to_memory(streaming.tumbling_counts(stream), "tumbling_out")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 2))
        for r in batch.groupBy(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == want


def test_session_counts_stream_runs(spark, events_stream_dir):
    stream = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    _run_to_memory(
        streaming.sessionized_counts(stream), "session_out"
    )
    rows = spark.sql("SELECT * FROM session_out").collect()
    assert rows
    assert all(r.session_start <= r.session_end for r in rows)
    # session count per user must match the batch lag/cumsum twin
    n_sessions_stream = len(rows)
    from financial_data_pipeline_optimization_spark import queries as q

    n_sessions_batch = q.q_session_window(spark, SF_SMOKE).count()
    assert n_sessions_stream == n_sessions_batch


def test_stream_dedup_and_upsert_idempotent(spark, events_stream_dir):
    import os

    target = tempfile.mkdtemp(prefix="upsert_target_")
    shutil.rmtree(target)  # foreachBatch creates it
    try:
        stream = streaming.read_stream_parquet(
            spark, events_stream_dir, schemas.TESTDATA["events"]
        )
        deduped = streaming.stream_dedup_by_key(stream, ["event_id"])
        sink = streaming.foreach_batch_upsert(target, ["event_id"])
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_events = load_table(spark, SF_SMOKE, "events").count()
        assert spark.read.parquet(target).count() == n_events

        # replay the same data through a fresh stream -> 0 new rows
        q2 = (
            streaming.read_stream_parquet(
                spark, events_stream_dir, schemas.TESTDATA["events"]
            )
            .writeStream.foreachBatch(sink)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="ckpt2_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(target).count() == n_events
    finally:
        shutil.rmtree(target, ignore_errors=True)
        assert os.path.exists(events_stream_dir)


def test_run_pipeline_streaming_incremental_replay_idempotent(
    spark, tmp_path
):
    """VERDICT r4 #4: the ACTUAL streaming entry point —
    ``run_pipeline_streaming`` (AvailableNow + foreachBatch merge) —
    must be idempotent at the warehouse level: replaying the same
    landing files through a FRESH checkpoint appends 0 rows, and a
    restart with the SAME checkpoint processes nothing."""
    from financial_data_pipeline_optimization_spark.plans import finance

    landing = str(tmp_path / "landing")
    warehouse = str(tmp_path / "warehouse")
    # Two landed batches with disjoint date ranges, as separate files
    # so maxFilesPerTrigger=1 forces multiple micro-batches through the
    # merge (each one anti-joins against what previous batches wrote).
    finance.synthetic_prices(spark, days=10, start_date="2023-01-02",
                             batch_id=0).coalesce(1).write.mode(
        "append").parquet(landing)
    finance.synthetic_prices(spark, days=10, start_date="2023-06-01",
                             batch_id=1).coalesce(1).write.mode(
        "append").parquet(landing)

    q = finance.run_pipeline_streaming(
        spark, landing, warehouse,
        checkpoint_path=str(tmp_path / "ckpt1"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    wh = spark.read.parquet(warehouse)
    n_first = wh.count()
    assert n_first == 20 * 10 * 2  # tickers x days x disjoint batches
    # merge key is unique -> no duplicates slipped through the batches
    assert wh.select("id").distinct().count() == n_first

    # Full replay: FRESH checkpoint re-reads every landing file; the
    # warehouse-level anti-join must drop them all.
    q2 = finance.run_pipeline_streaming(
        spark, landing, warehouse,
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(warehouse).count() == n_first

    # Restart with the SAME checkpoint: source-level idempotence — the
    # query comes up, finds no new files, and stops without a batch.
    q3 = finance.run_pipeline_streaming(
        spark, landing, warehouse,
        checkpoint_path=str(tmp_path / "ckpt1"),
    )
    q3.awaitTermination(120)
    assert spark.read.parquet(warehouse).count() == n_first


def test_running_counts_stateful_projects_before_state_boundary(
    spark, events_stream_dir
):
    """r16: only (key_col, value_col) may cross the state shuffle and
    the Arrow boundary — Spark cannot prune columns through the opaque
    Python state function, so the operator must project explicitly
    (events carry ts/k the update function never reads)."""
    import re

    import inspect

    stream = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    df = streaming.running_counts_stateful(stream)
    # Structural match (r17, ADVICE): walk the analyzed tree instead of
    # assuming the Project is the literal next line of the plan string
    # (formatting shifts across Spark versions), and derive the
    # expected columns from the operator's own default args instead of
    # hardcoding them.
    sig = inspect.signature(streaming.running_counts_stateful)
    expected = {
        sig.parameters["key_col"].default,
        sig.parameters["value_col"].default,
    }
    node = df._jdf.queryExecution().analyzed()
    assert "FlatMapGroupsInPandasWithState" in node.nodeName(), (
        node.toString()
    )
    # Descend to the first Project between the state node and the
    # relation; its output must be exactly the state-boundary columns.
    child = node.children().head()
    while "Project" not in child.nodeName():
        assert child.children().size() == 1, child.toString()
        child = child.children().head()
    cols = {
        re.match(r"(\w+)", str(child.output().apply(i).name())).group(1)
        for i in range(child.output().size())
    }
    assert cols == expected, child.toString()


def test_running_counts_stateful_matches_batch(spark, events_stream_dir):
    stream = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    q = (
        streaming.running_counts_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per key per micro-batch; the LAST row
    # per key carries the final running totals
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    got = {}
    for r in rows:  # memory sink appends in batch order
        got[r.event_type] = (r.n_events, round(r.total_value, 2))
    batch = load_table(spark, SF_SMOKE, "events")
    want = {
        r.event_type: (r.n_events, round(r.total_value, 2))
        for r in batch.groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == want


def test_running_counts_agg_matches_stateful_and_batch(
    spark, events_stream_dir
):
    """r17 (VERDICT #7): the JVM-state rewrite of the running-counts
    semantics — a built-in streaming aggregation in update mode — must
    land on exactly the per-key totals the Python arbitrary-state
    operator (and the batch aggregation) produce, with the same output
    schema. This is the equivalence half of the documented A/B; the
    throughput half lives in STREAMING_BENCH.json."""
    stream = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    df = streaming.running_counts_agg(stream)
    assert [f.name for f in df.schema.fields] == [
        "event_type", "n_events", "total_value",
    ]
    q = (
        df.writeStream.format("memory")
        .queryName("stateful_jvm_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_jvm_out").collect()
    got = {}
    for r in rows:  # memory sink appends in batch order
        got[r.event_type] = (r.n_events, round(r.total_value, 2))
    batch = load_table(spark, SF_SMOKE, "events")
    want = {
        r.event_type: (r.n_events, round(r.total_value, 2))
        for r in batch.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_stream_stream_join_matches_batch(spark, events_stream_dir):
    left = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    right = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    q = (
        streaming.stream_stream_join(left, right, max_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT COUNT(*) AS n FROM ssj_out").first().n

    batch = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "value"
    )
    l = batch.alias("l")
    r = batch.alias("r")
    want = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 minutes")),
    ).count()
    assert got == want


def test_upsert_raises_on_corrupt_target_instead_of_duplicating(
    spark, tmp_path
):
    """First-run detection must only swallow a MISSING target. A
    corrupt/unreadable target used to be treated as 'first epoch',
    silently skipping the anti-join and appending duplicate rows — now
    it raises."""
    import pytest as _pytest

    from financial_data_pipeline_optimization_spark.streaming.ops import foreach_batch_upsert

    target = tmp_path / "corrupt_target"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"this is not parquet")
    batch = spark.createDataFrame([(1, "x")], "id long, v string")
    upsert = foreach_batch_upsert(str(target), keys=["id"])
    with _pytest.raises(Exception) as exc_info:
        upsert(batch, epoch_id=0)
    # the corruption surfaced; nothing was appended
    assert "PATH_NOT_FOUND" not in str(exc_info.value)
    assert not [
        p for p in target.iterdir() if p.stat().st_size > len(b"x") * 100
    ]


def test_load_warehouse_raises_on_corrupt_warehouse(spark, tmp_path):
    import pytest as _pytest

    from financial_data_pipeline_optimization_spark.plans import finance

    wh = tmp_path / "corrupt_wh"
    wh.mkdir()
    (wh / "part-00000.parquet").write_bytes(b"junk bytes")
    batch = finance.transform_prices(
        finance.extract_prices(
            finance.synthetic_prices(spark, days=3, batch_id=0)
        )
    )
    with _pytest.raises(Exception):
        finance.load_warehouse(batch, str(wh), mode="incremental")


def test_stream_dedup_within_watermark_collapses_key_reemissions(spark):
    """Key-only dedup: the same user re-emitted at DIFFERENT event
    times within the watermark collapses to one row, which plain
    dropDuplicates([key, ts]) would keep twice."""
    import tempfile as _tf

    src = _tf.mkdtemp(prefix="dedup_src_")
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:05:00"),  # same key, different ts
            (2, "2024-01-01 10:01:00"),
        ],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    deduped = streaming.stream_dedup_within_watermark(
        stream, ["user_id"], ts_col="ts", watermark="1 hour"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id FROM dedup_wm").collect()
    assert sorted(r.user_id for r in rows) == [1, 2]
    shutil.rmtree(src, ignore_errors=True)


def test_stream_static_enrich_matches_batch(spark, events_stream_dir):
    """Stream-static join: streamed events enriched with a static dim
    must equal the batch join on the same data, and the streaming plan
    must not add a stateful operator (no watermark needed)."""
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "buy"),
         ("signup", "acquire"), ("error", "ops")],
        "event_type string, category string",
    )
    stream = streaming.read_stream_parquet(
        spark, events_stream_dir, schemas.TESTDATA["events"]
    )
    enriched = streaming.stream_static_enrich(stream, dim, "event_type")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT category, count(*) AS n FROM enrich_out GROUP BY 1"
    ).collect()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .join(dim, "event_type")
        .groupBy("category")
        .count()
    ).collect()
    assert {(r.category, r.n) for r in got} == {
        (r.category, r["count"]) for r in batch
    }


def test_stream_near_dup_filter_matches_batch_dedup(spark, tmp_path):
    """Streaming near-dup filtering (foreach_batch_near_dup_filter)
    over two landed batches must keep exactly the docs a BATCH LSH
    dedup over the full corpus keeps (survivor = no verified pair to a
    lower id / earlier batch) — the streaming twin of the incremental
    ≡ batch identity pinned in tests/test_dedup.py."""
    from financial_data_pipeline_optimization_spark.operators import dedup
    from financial_data_pipeline_optimization_spark.schemas import TESTDATA  # noqa: F401

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    landing = str(tmp_path / "landing")
    clean = str(tmp_path / "clean")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    sink = streaming.foreach_batch_near_dup_filter(
        clean, store, "doc_id", "text", min_jaccard=0.8, shingle_n=2
    )
    schema = docs.schema
    for batch in (b1, b2):
        batch.write.mode("append").parquet(landing)
        q = (
            spark.readStream.schema(schema)
            .parquet(landing)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    kept = {
        r.doc_id for r in spark.read.parquet(clean).collect()
    }

    # batch-expected survivors: drop a doc iff it has a verified pair
    # to a doc in an earlier batch, or to a lower id in its own batch
    pairs = [
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", shingle_n=2, min_jaccard=0.8
        ).collect()
    ]
    # Replicate the filter's semantics exactly: docs are considered in
    # (batch, id) order and a doc is dropped iff it pairs with a doc
    # that itself SURVIVED (the store holds only survivors' rows, so
    # chains A~B~C keep C when B was dropped for A but C~A is false).
    batch_of = {r.doc_id: r.doc_id % 2 for r in docs.collect()}
    survivors = set()
    dropped = set()
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for d in sorted(batch_of, key=lambda d: (batch_of[d], d)):
        if any(
            n in survivors for n in adj.get(d, ())
        ):
            dropped.add(d)
        else:
            survivors.add(d)
    assert kept == survivors


def test_stream_near_dup_filter_rejects_legacy_banded_store(
    spark, tmp_path
):
    """Migration gate at the STREAMING boundary: a signature store
    persisted under a different banding geometry (e.g. written before
    the r14 derived-banding default) must make the micro-batch fail
    fast with StoreBandingMismatch instead of silently matching
    nothing cross-batch."""
    import pytest

    from financial_data_pipeline_optimization_spark.operators import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    clean = str(tmp_path / "clean")
    store = str(tmp_path / "store")

    # Seed the persisted store with LEGACY 16-band rows.
    ob, os_ = dedup.minhash_store(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text",
        shingle_n=2, bands=16,
    )
    ob.write.parquet(f"{store}/bands")
    os_.write.parquet(f"{store}/sets")

    sink = streaming.foreach_batch_near_dup_filter(
        clean, store, "doc_id", "text", min_jaccard=0.8, shingle_n=2
    )
    with pytest.raises(dedup.StoreBandingMismatch):
        sink(docs.where(F.col("doc_id") % 2 == 1), 0)


def test_tumbling_watermark_drops_late_rows(spark, tmp_path):
    """The watermark contract itself, via append mode's finalization
    semantics: a row that arrives BEHIND the checkpointed watermark is
    dropped — its window never appears in the finalized output even
    after the watermark passes it — while an on-time row in the same
    micro-batch lands normally. Three AvailableNow runs share one
    checkpoint so the watermark persists across restarts (the
    production shape of a periodically-triggered incremental job)."""
    import pandas as pd

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "ts timestamp, event_type string, value double"

    def write_batch(rows):
        spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["ts", "event_type", "value"]
            ).astype({"ts": "datetime64[us]"})
        ).write.mode("append").parquet(src)

    def run():
        stream = streaming.read_stream_parquet(spark, src, schema)
        q = (
            streaming.tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def finalized():
        rows = spark.read.parquet(out).collect()
        return {
            r.window_start.strftime("%H:%M"): r.n_events for r in rows
        }

    # Run 1: watermark ends at 10:30 - 2h = 08:30 -> only the 00:00
    # window is final.
    write_batch(
        [
            ("2024-01-01 00:30:00", "click", 1.0),
            ("2024-01-01 10:30:00", "click", 1.0),
        ]
    )
    run()
    assert finalized() == {"00:00": 1}

    # Run 2: 01:00 arrives BEHIND the 08:30 watermark (stale -> must
    # be dropped); 11:00 is on time. Watermark advances to 09:00.
    write_batch(
        [
            ("2024-01-01 01:00:00", "click", 99.0),
            ("2024-01-01 11:00:00", "click", 1.0),
        ]
    )
    run()
    assert finalized() == {"00:00": 1}  # 01:00 not finalized...

    # Run 3: 14:30 advances the watermark to 12:30, finalizing the
    # 10:00 and 11:00 windows (their ends, 11:00/12:00, are now behind
    # it). Had the stale 01:00 row been wrongly accepted, its window
    # (end 02:00 <= watermark) would appear here.
    write_batch([("2024-01-01 14:30:00", "click", 1.0)])
    run()
    got = finalized()
    assert "01:00" not in got, got  # ...and never will be: dropped
    assert got == {"00:00": 1, "10:00": 1, "11:00": 1}, got


def test_streaming_bench_scenarios_build(spark):
    """tools/bench_streaming.py's scenarios must stay buildable: each
    one composes a streaming DataFrame from the rate-micro-batch
    source (plan construction only — the throughput harness itself is
    run manually and its artifact checked in as STREAMING_BENCH.json)."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parents[1] / "tools")
    )
    import bench_streaming as bs

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .load()
    )
    for name, (build, mode, rpb) in bs.SCENARIOS.items():
        df = build(src)
        assert df.isStreaming, name
        assert mode in ("append", "update"), name
        assert rpb > 0, name
