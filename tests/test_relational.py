"""Parity tests: every registered relational case vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from sqlmesh_spark.parity import compare_case
from sqlmesh_spark.registry import load_all


def _cases(tag):
    return [(n, c) for n, c in load_all().items() if tag in c.tags]


@pytest.mark.parametrize("name,case", _cases("relational"), ids=lambda x: x if isinstance(x, str) else "")
def test_relational_parity(spark, sf_dir, name, case):
    r = compare_case(spark, sf_dir, name, case.fn, case.oracle)
    assert r["match"], r["detail"]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
