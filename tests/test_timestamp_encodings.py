"""Event-time queries must survive every parquet timestamp encoding.

The driver's testdata has already shipped ``events.ts`` two different
ways across rounds — TIMESTAMP(NANOS), then plain ``timestamp[us]``
with no UTC-adjust flag (which Spark loads as TIMESTAMP_NTZ and whose
epoch functions then reject). This suite pins the engine's contract:
``load_table`` normalizes all three encodings a writer can plausibly
produce to instant-typed ``timestamp``, and the event-time operators
(sessionization, as-of join, range join) return IDENTICAL results on
each.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from financial_data_pipeline_optimization_spark import queries
from tests.conftest import SF_SMOKE

QUERY_NAMES = [
    "session_window_agg",
    "asof_join_nearest_view",
    "range_join_followers",
]

ENCODINGS = {
    # TIMESTAMP(NANOS): what the round-1/2 driver wrote. Spark can only
    # read it via the nanosAsLong legacy flag (as int64), which
    # load_table converts back to µs timestamps.
    "nanos": pa.timestamp("ns"),
    # tz-naive µs: pandas/pyarrow's default — loads as TIMESTAMP_NTZ,
    # the round-3 breakage this suite exists for.
    "us_ntz": pa.timestamp("us"),
    # µs with isAdjustedToUTC: loads directly as timestamp.
    "us_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """sf-dir per encoding, each holding the same events rows with ts
    re-encoded."""
    src = pq.read_table(f"{SF_SMOKE}/events.parquet")
    ts_idx = src.schema.get_field_index("ts")
    base_ts = src.column("ts")
    if pa.types.is_timestamp(base_ts.type) and base_ts.type.tz is None:
        # interpret the naive wall clock as UTC before re-encoding so
        # every variant carries the same instants
        base_ts = base_ts.cast(pa.timestamp(base_ts.type.unit, tz="UTC"))
    dirs = {}
    for name, ts_type in ENCODINGS.items():
        out = tmp_path_factory.mktemp(f"enc_{name}")
        table = src.set_column(ts_idx, "ts", base_ts.cast(ts_type))
        pq.write_table(table, str(out / "events.parquet"), version="2.6")
        dirs[name] = str(out)
    return dirs


@pytest.mark.parametrize("qname", QUERY_NAMES)
def test_event_time_queries_identical_across_encodings(
    spark, encoded_dirs, qname
):
    spec = {s.name: s for s in queries.registry()}[qname]
    results = {}
    for enc, sf_dir in encoded_dirs.items():
        df = spec.spark(spark, sf_dir)
        assert not any(t == "timestamp_ntz" for _, t in df.dtypes), (
            enc,
            df.dtypes,
        )
        results[enc] = sorted(
            map(tuple, df.collect()), key=lambda r: tuple(map(str, r))
        )
    baseline = results["us_utc"]
    assert len(baseline) > 0
    assert results["us_ntz"] == baseline
    assert results["nanos"] == baseline
