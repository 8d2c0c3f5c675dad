"""Rotation contract: the driver samples a capped PREFIX of load_all()'s
ordering, so the order IS the external-verification policy.  Three-phase
emission (round 9): never-sampled cases first (newest-registered first
within a family), then cases whose LATEST CORRECTNESS_r*.json record
failed (round 8 found 18 cases stranded with round-1/2 harness failures
as their latest external record because "sampled-and-failed" sorted like
"sampled-and-green"), then green cases in registration order — every
phase family-interleaved so any prefix spans all operator families.
"""

from __future__ import annotations

import sqlmesh_spark.registry as registry
from sqlmesh_spark.registry import QueryCase, _interleaved


def _mk(names):
    return {n: QueryCase(name=n, fn=None, oracle=None, tags=(n.split("_")[0],)) for n in names}


def test_failed_latest_precedes_green(monkeypatch):
    reg = _mk(["fam1_a", "fam1_b", "fam1_c", "fam2_x", "fam2_y", "fam2_z"])
    monkeypatch.setattr(
        registry,
        "_previously_sampled",
        lambda: ({"fam1_a", "fam2_x", "fam2_y"}, {"fam1_c", "fam2_z"}),
    )
    order = list(_interleaved(reg))
    # never-sampled first (fam1_b), then the failed pair, then green.
    assert order[0] == "fam1_b"
    assert set(order[1:3]) == {"fam1_c", "fam2_z"}
    assert set(order[3:]) == {"fam1_a", "fam2_x", "fam2_y"}


def test_latest_verdict_wins_across_rounds(tmp_path, monkeypatch):
    import json

    # r1 fails case_a; r2 re-samples it green; case_b fails in r2 and is
    # never re-sampled — only case_b should be in the failed set.
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"case_a": {"rows_match": None, "err": "boom"}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "case_a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
                "case_b": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
            }
        )
    )
    import os

    inner = tmp_path / "pkg"
    inner.mkdir()
    monkeypatch.setattr(os.path, "abspath", lambda p: str(inner / "registry.py"))
    green, failed = registry._previously_sampled()
    assert green == {"case_a"}
    assert failed == {"case_b"}


def test_real_ledger_failed_cases_lead_prefix():
    green, failed = registry._previously_sampled()
    order = list(registry.load_all())
    # Every failed-at-latest case must appear inside a 55-case sweep prefix
    # (after any never-sampled cases, which take absolute priority).
    unsampled = [n for n in order if n not in green and n not in failed]
    prefix = order[: len(unsampled) + len(failed)]
    assert failed <= set(prefix)
