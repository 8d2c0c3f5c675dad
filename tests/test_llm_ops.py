"""LLM data-pipeline operators: parity, LSH recall, multimodal plumbing."""

from __future__ import annotations

import pytest

from sqlmesh_spark.parity import compare_case
from sqlmesh_spark.registry import load_all


def _cases():
    return [(n, c) for n, c in load_all().items() if "llm" in c.tags]


@pytest.mark.parametrize("name,case", _cases(), ids=lambda x: x if isinstance(x, str) else "")
def test_llm_parity(spark, sf_dir, name, case):
    r = compare_case(spark, sf_dir, name, case.fn, case.oracle)
    assert r["match"], r["detail"]


def test_minhash_lsh_recall_vs_bruteforce(spark, sf_dir):
    """LSH candidates + verify must recover (almost) all true near-dup
    pairs; at j≈1.0 the banding detection probability is ~1.0, so on this
    data recall should be total."""
    from sqlmesh_spark.llm.dedup import minhash_lsh_sql, ngram_jaccard_sql
    from sqlmesh_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("documents",))
    truth = {
        (r.d1, r.d2)
        for r in spark.sql(ngram_jaccard_sql("documents", dialect="spark")).collect()
    }
    lsh = {
        (r.d1, r.d2)
        for r in spark.sql(minhash_lsh_sql("documents", dialect="spark")).collect()
    }
    assert lsh <= truth  # verify step guarantees no false positives
    if truth:
        assert len(lsh) / len(truth) >= 0.9


def test_decode_stub_raises(spark):
    from sqlmesh_spark.llm.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_multimodal_schema(spark, sf_dir):
    from sqlmesh_spark.llm.multimodal import attach_binary_payload
    from sqlmesh_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    attached = attach_binary_payload(docs)
    assert dict(attached.dtypes)["payload"] == "binary"
    meta_type = attached.schema["media_meta"].dataType.simpleString()
    assert "n_bytes" in meta_type and "mime" in meta_type
