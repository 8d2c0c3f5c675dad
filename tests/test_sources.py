"""Loader regression tests.

Round-1 postmortem: a testdata change (events.ts parquet TIMESTAMP(NANOS) ->
timestamp[us]) made ``_load_events`` throw at ANALYSIS time, silently zeroing
out every events-consuming case. These tests pin the loader contract so a
future dtype change fails here, loudly, instead.
"""

from __future__ import annotations

import duckdb
import pytest

from sqlmesh_spark.sources.tables import TABLES, load_table

SFS = ("/root/testdata/sf0.001",)


@pytest.mark.parametrize("name", TABLES)
def test_every_table_analyzes_and_has_rows(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    # .schema forces analysis; .head forces one task of execution.
    assert df.schema is not None
    assert df.head(1), f"{name} is empty"


def test_events_contract(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    got = [
        (r.event_id, r.ts, r.ts_ns)
        for r in df.select("event_id", "ts", "ts_ns").orderBy("event_id").limit(20).collect()
    ]
    want = duckdb.sql(
        f"select event_id, ts, epoch_ns(ts) from '{sf_dir}/events.parquet' "
        "order by event_id limit 20"
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_events_ts_ns_exactness(spark, sf_dir):
    # ts_ns must be derived with integer arithmetic: epoch-nanos exceed
    # double's 2^53 mantissa, so any float path shows up as off-by-one micros.
    df = load_table(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    bad = df.filter(F.unix_micros(F.col("ts")) * 1000 != F.col("ts_ns")).count()
    assert bad == 0
