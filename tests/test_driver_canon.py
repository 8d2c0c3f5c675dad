"""Driver-canon contract: the driver's correctness gate sorts result
frames with pandas ``sort_values`` over RAW cells before hashing, which
crashes on unhashable container cells (round-8's only red row:
``framework_pg8_features_model`` returned three raw ARRAY columns and the
driver recorded ``TypeError: unhashable type: 'list'``).

Two layers pin the contract:

1. Unit tests that ``parity.driver_canon_check`` reproduces the driver's
   failure on list/dict cells and passes scalar frames — so
   ``compare_case`` (and therefore ``tools/verify_all.py``) can no longer
   pass a case the driver would crash on.
2. A registry-wide schema gate: DuckDB ``DESCRIBE`` on every registered
   oracle, failing on any top-level LIST/STRUCT/MAP/UNION column.  This
   is cheap (no Spark, no execution) and catches the shipping class at
   its source: an oracle that returns containers implies the Spark side
   does too.  Cases must serialize containers (``array_to_string`` /
   ``to_json``) on BOTH sides, as ``nested_types_roundtrip`` does.
"""

from __future__ import annotations

import pandas as pd
import pytest

from sqlmesh_spark.parity import driver_canon_check, duck_connection
from sqlmesh_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_canon_passes_scalar_frame():
    df = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "z", "y"]})
    assert driver_canon_check(df) is None


def test_canon_fails_list_cells():
    df = pd.DataFrame({"a": [1, 2], "arr": [[1, 2], [3]]})
    err = driver_canon_check(df)
    assert err is not None and "unhashable" in err


def test_canon_fails_dict_cells():
    df = pd.DataFrame({"a": [1, 2], "m": [{"k": 1}, {"k": 2}]})
    err = driver_canon_check(df)
    assert err is not None


def test_compare_case_rejects_container_output(spark):
    from sqlmesh_spark.parity import compare_case

    def fn(spark, sf_dir):
        return spark.sql("SELECT 1 AS a, array(1, 2) AS arr")

    r = compare_case(spark, SF, "container_probe", fn, "SELECT 1 AS a, [1, 2] AS arr")
    assert not r["match"]
    assert "driver canon" in r["detail"]


def test_no_registered_oracle_returns_containers():
    con = duck_connection(SF)
    flagged = []
    try:
        for name, case in load_all().items():
            if case.oracle is None:
                continue
            desc = con.execute("DESCRIBE " + case.oracle).fetchall()
            for col, typ, *_ in desc:
                t = str(typ).upper()
                if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                    flagged.append(f"{name}.{col}: {typ}")
    finally:
        con.close()
    assert not flagged, (
        "oracle outputs with top-level container columns (driver canon "
        f"crashes on these — serialize with array_to_string/to_json): {flagged}"
    )
