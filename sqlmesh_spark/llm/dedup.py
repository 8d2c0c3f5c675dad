"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — the standard near-dup ladder for pre-training corpora.

Everything is built from set-oriented Spark SQL (shuffle-friendly,
no driver loops, no Python UDFs):

- Shingling explodes positions with sequence(); at 100 TB you shingle
  per-partition at scan speed and the only shuffles are the group-bys.
- MinHash banding turns the O(n²) pair space into per-bucket joins —
  the LSH candidate join is the scale path; the exact-Jaccard verify
  runs only on candidates.
- Hashes are md5-derived 60-bit ints (CONV on Spark, '0x..'::BIGINT on
  DuckDB) so every case has a true value-level oracle. Production would
  swap in xxhash64 (same shape, JVM-native, no hex detour).

Reference tie-in: the reference's own dedup surface is @deduplicate
(macros.py:1241) — exact key dedup; the fuzzy ladder here is the
engine-level extension a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sqlmesh_spark.registry import register
from sqlmesh_spark.sources.tables import register_views


def _hash60(expr: str, dialect: str) -> str:
    """Portable 60-bit integer hash from md5 hex."""
    if dialect == "duckdb":
        return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
    return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _seq(lo: str, hi: str, alias: str, dialect: str) -> str:
    """Lateral integer range [lo, hi] as a join-able relation."""
    if dialect == "duckdb":
        return f"unnest(generate_series({lo}, {hi})) AS _{alias}({alias})"
    return f"LATERAL explode(sequence({lo}, {hi})) AS _{alias}({alias})"


def _shingles(table: str, k: int, dialect: str) -> str:
    """Distinct character k-gram shingles per document."""
    return f"""
  SELECT DISTINCT doc_id, SUBSTRING(text, CAST(i AS INT), {k}) AS g
  FROM {table}, {_seq("1", f"GREATEST(LENGTH(text) - {k - 1}, 1)", "i", dialect)}
"""


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_sql(table: str, dialect: str = "spark") -> str:
    """Hash-groupBy exact dedup on normalized text: emit the keeper
    (min doc_id) and the duplicate count per content hash."""
    norm = "trim(regexp_replace(lower(text), ' +', ' '))"
    return f"""
SELECT MD5({norm}) AS content_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM {table}
GROUP BY MD5({norm})
"""


# ---------------------------------------------------------------------------
# Brute-force n-gram Jaccard (the truth the fuzzy methods approximate)
# ---------------------------------------------------------------------------


def ngram_jaccard_sql(table: str, k: int = 5, threshold: float = 0.6, dialect: str = "spark") -> str:
    return f"""
WITH sh AS ({_shingles(table, k, dialect)}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2,
       ROUND(CAST(common AS DOUBLE) / (s1.n + s2.n - common), 4) AS jaccard
FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) > {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle → minhash → band → bucket-join → verify)
# ---------------------------------------------------------------------------


def minhash_lsh_sql(
    table: str,
    k: int = 5,
    num_hashes: int = 32,
    band_size: int = 4,
    threshold: float = 0.6,
    dialect: str = "spark",
) -> str:
    """Candidate pairs from banded minhash signatures, then exact-Jaccard
    verification on candidates only.

    num_hashes=32, band_size=4 → 8 bands: detection probability
    1-(1-j⁴)⁸ ≈ 1.0 at j≥0.9, ~0.56 at j=0.6 — tuned for near-dup
    harvesting. Band keys are order-insensitive BIT_XOR folds, portable
    across engines.
    """
    h = _hash60("CONCAT(CAST(i AS STRING), ':', g)", dialect)
    bh = _hash60("CONCAT(CAST(i AS STRING), '_', CAST(mh AS STRING))", dialect)
    xor = "BIT_XOR" if dialect != "duckdb" else "bit_xor"
    return f"""
WITH sh AS ({_shingles(table, k, dialect)}),
sig AS (
  SELECT doc_id, i, MIN({h}) AS mh
  FROM sh, {_seq("0", str(num_hashes - 1), "i", dialect)}
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(FLOOR(i / {band_size}) AS INT) AS band, {xor}({bh}) AS bkey
  FROM sig GROUP BY doc_id, CAST(FLOOR(i / {band_size}) AS INT)
),
candidates AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
verified AS (
  SELECT c.d1, c.d2, COUNT(*) AS common
  FROM candidates c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
  GROUP BY c.d1, c.d2
)
SELECT v.d1, v.d2,
       ROUND(CAST(common AS DOUBLE) / (s1.n + s2.n - common), 4) AS jaccard
FROM verified v JOIN sizes s1 ON v.d1 = s1.doc_id JOIN sizes s2 ON v.d2 = s2.doc_id
WHERE CAST(common AS DOUBLE) / (s1.n + s2.n - common) > {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_sql(table: str, max_hamming: int = 3, dialect: str = "spark") -> str:
    """64→60-bit SimHash over distinct words; near-dup pairs by Hamming
    distance. Bit extraction and XOR differ lexically per engine."""
    h = _hash60("w", dialect)
    if dialect == "duckdb":
        bit = "((h >> b) & 1)"
        ham = "bit_count(xor(a.simhash, b.simhash))"
    else:
        bit = "(SHIFTRIGHT(h, b) & 1)"
        ham = "bit_count(a.simhash ^ b.simhash)"
    if dialect == "duckdb":
        words = "SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM " + table
    else:
        words = (
            "SELECT DISTINCT doc_id, w FROM "
            + table
            + " LATERAL VIEW explode(split(lower(text), ' ')) AS w"
        )
    return f"""
WITH words AS ({words}),
tok AS (SELECT doc_id, {h} AS h FROM words WHERE w <> ''),
bits AS (
  SELECT doc_id, b,
         CASE WHEN SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS bitval
  FROM tok, {_seq("0", "59", "b", dialect)}
  GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id, SUM(bitval * CAST(POWER(2, b) AS BIGINT)) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2, {ham} AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE {ham} <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (rank-based: top-N closest pairs)
# ---------------------------------------------------------------------------


def embedding_topn_pairs_sql(table: str, top_n: int = 20, dialect: str = "spark") -> str:
    """Top-N most-similar embedding pairs by exact cosine. Dot products and
    norms accumulate as scaled integers (ROUND(x*y*1e6) per element) so the
    sums are order-insensitive and bit-identical across engines; ordering
    uses the rounded similarity with id tie-breaks."""
    if dialect == "duckdb":
        elems = f"""
  SELECT vec_id, CAST(i AS INT) AS ord, CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
  FROM {table}, unnest(generate_series(1, len(embedding))) AS _i(i)
"""
    else:
        elems = f"""
  SELECT vec_id, pos + 1 AS ord, CAST(val AS DOUBLE) AS val
  FROM {table} LATERAL VIEW posexplode(embedding) AS pos, val
"""
    return f"""
WITH elems AS ({elems}),
norms AS (
  SELECT vec_id, SUM(CAST(ROUND(val * val * 1000000) AS BIGINT)) AS nrm
  FROM elems GROUP BY vec_id
),
dots AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         SUM(CAST(ROUND(a.val * b.val * 1000000) AS BIGINT)) AS dot
  FROM elems a JOIN elems b ON a.ord = b.ord AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
sims AS (
  SELECT v1, v2,
         ROUND(CAST(dot AS DOUBLE) / SQRT(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)), 6) AS cosine
  FROM dots JOIN norms n1 ON v1 = n1.vec_id JOIN norms n2 ON v2 = n2.vec_id
)
SELECT v1, v2, cosine FROM sims
ORDER BY cosine DESC, v1, v2
LIMIT {top_n}
"""


# ---------------------------------------------------------------------------
# Registry cases
# ---------------------------------------------------------------------------


def _doc_case(sql_fn, **kwargs):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, ("documents",))
        return spark.sql(sql_fn("documents", dialect="spark", **kwargs))

    return run


register("dedup_exact", oracle=exact_dedup_sql("documents", "duckdb"), tags=("llm", "dedup"))(
    _doc_case(exact_dedup_sql)
)
register(
    "dedup_ngram_jaccard",
    oracle=ngram_jaccard_sql("documents", dialect="duckdb"),
    tags=("llm", "dedup"),
)(_doc_case(ngram_jaccard_sql))
register(
    "dedup_minhash_lsh",
    oracle=minhash_lsh_sql("documents", dialect="duckdb"),
    tags=("llm", "dedup", "bench"),
)(_doc_case(minhash_lsh_sql))
register(
    "dedup_simhash",
    oracle=simhash_sql("documents", dialect="duckdb"),
    tags=("llm", "dedup"),
)(_doc_case(simhash_sql))


def _emb_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(embedding_topn_pairs_sql("embeddings", dialect="spark"))


register(
    "dedup_embedding_cosine",
    oracle=embedding_topn_pairs_sql("embeddings", dialect="duckdb"),
    tags=("llm", "dedup"),
)(_emb_case)
