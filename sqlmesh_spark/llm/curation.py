"""Data-curation operators for pre-training pipelines: repetition-based
quality signals (Gopher-style), train/benchmark decontamination, PII
scrubbing, and deterministic stratified sampling.

Beyond-reference extensions (SURVEY.md §8 training-data ops): the reference
delegates all relational work to its engine (sqlmesh/core/engine_adapter/
base.py:84) and ships no corpus-curation operators; these are the Spark-
native additions a 100 TB text pipeline needs.

Scale design:
- Repetition stats are a SINGLE fused scan with array higher-order
  functions (transform/filter/array_distinct) — all JVM-side inside
  whole-stage codegen, zero shuffles, zero Python.
- Decontamination shuffles once on the shingle hash; the benchmark side is
  tiny after distinct-ing and broadcast-joins into the corpus scan.
- PII scrubbing is pure regexp_replace projection — scan speed.
- Stratified sampling is one window shuffle on the stratum key; for skewed
  strata, swap in the salted two-phase top-k from operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sqlmesh_spark.llm.dedup import _hash60, _rx_replace_all, shingle_hashes_sql
from sqlmesh_spark.registry import register
from sqlmesh_spark.sources.tables import register_views

# --------------------------------------------------------------------------
# Cross-dialect array/list helpers (Spark SQL ↔ DuckDB)
# --------------------------------------------------------------------------


def _elem(arr: str, i: str, dialect: str) -> str:
    """1-based element access."""
    if dialect == "duckdb":
        return f"{arr}[{i}]"
    return f"element_at({arr}, CAST({i} AS INT))"


def _xform(arr: str, body: str, dialect: str) -> str:
    fn = "list_transform" if dialect == "duckdb" else "transform"
    return f"{fn}({arr}, i -> {body})"


def _countin(arr: str, var: str, dialect: str) -> str:
    """Occurrences of ``var`` inside ``arr``."""
    if dialect == "duckdb":
        return f"len(list_filter({arr}, x -> x = {var}))"
    return f"size(filter({arr}, x -> x = {var}))"


def _distinct(arr: str, dialect: str) -> str:
    return f"{'list_distinct' if dialect == 'duckdb' else 'array_distinct'}({arr})"


def _alen(arr: str, dialect: str) -> str:
    return f"{'len' if dialect == 'duckdb' else 'size'}({arr})"


def _amax(arr: str, dialect: str) -> str:
    return f"{'list_max' if dialect == 'duckdb' else 'array_max'}({arr})"


def _aslice(arr: str, lo: str, n: str, dialect: str) -> str:
    fn = "list_slice" if dialect == "duckdb" else "slice"
    return f"{fn}({arr}, {lo}, {n})"


def _rx_count(col: str, pat: str, dialect: str) -> str:
    if dialect == "duckdb":
        return f"len(regexp_extract_all({col}, '{pat}'))"
    return f"regexp_count({col}, '{pat.replace(chr(92), chr(92) * 2)}')"


# --------------------------------------------------------------------------
# Repetition / duplication quality signals (Gopher-style filters)
# --------------------------------------------------------------------------


def repetition_stats_sql(table: str, dialect: str = "spark") -> str:
    """Per-document repetition signals: duplicate-word fraction, most-common
    word fraction, most-common bigram fraction — the Gopher repetition
    filters, word-level. All ratios' keep/drop decisions are cross-
    multiplied into pure-integer comparisons so no engine-specific float
    division sits on a threshold boundary.

    One fused projection per doc: words array → distinct count + per-
    distinct-word occurrence max (O(n·vocab) inside codegen, no shuffle).
    """
    d = dialect
    split = (
        "string_split(text, ' ')" if d == "duckdb" else "split(text, ' ')"
    )
    # most-common-element count of an array, via max over its distinct values
    top_w = _amax(
        _xform(_distinct("ws", d), _countin("ws", "i", d), d), d
    )
    big_body = (
        f"{_elem('ws', 'i', d)} || ' ' || {_elem('ws', 'i + 1', d)}"
        if d == "duckdb"
        else f"concat({_elem('ws', 'i', d)}, ' ', {_elem('ws', 'i + 1', d)})"
    )
    seq = (
        "generate_series(1, n_words - 1)" if d == "duckdb" else "sequence(1, n_words - 1)"
    )
    top_b = _amax(_xform(_distinct("bs", d), _countin("bs", "i", d), d), d)
    return f"""
WITH arr AS (
  SELECT doc_id, {split} AS ws, {_alen(split, d)} AS n_words FROM {table}
),
big AS (
  SELECT doc_id, ws, n_words,
         CASE WHEN n_words >= 2 THEN {_xform(seq, big_body, d)}
              ELSE {_aslice("ws", "1", "0", d)} END AS bs
  FROM arr
),
cnt AS (
  SELECT doc_id, n_words,
         {_alen(_distinct("ws", d), d)} AS n_distinct,
         {top_w} AS top_word_cnt,
         CASE WHEN n_words >= 2 THEN {top_b} ELSE 0 END AS top_bigram_cnt
  FROM big
)
SELECT doc_id, n_words, n_distinct, top_word_cnt, top_bigram_cnt,
       ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS dup_word_ratio,
       ROUND(CAST(top_word_cnt AS DOUBLE) / n_words, 4) AS top_word_frac,
       CASE WHEN top_word_cnt * 100 < n_words * 12
             AND top_bigram_cnt * 100 < n_words * 5
             AND n_distinct * 100 > n_words * 22 THEN 1 ELSE 0 END AS keep
FROM cnt
"""


def _doc_case(sql_fn, **kw):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from sqlmesh_spark.llm.dedup import spread_scan

        register_views(spark, sf_dir, ("documents",))
        # CPU-heavy array/regex projections parallelize only if the local
        # 1-split scan is spread; at scale this is a no-op (see spread_scan).
        docs = spread_scan(spark, "documents", "curation_docs")
        return spark.sql(sql_fn(docs, dialect="spark", **kw))

    return run


register(
    "text_repetition_stats",
    oracle=repetition_stats_sql("documents", "duckdb"),
    tags=("llm", "text"),
)(_doc_case(repetition_stats_sql))


# --------------------------------------------------------------------------
# Train/benchmark decontamination (n-gram overlap)
# --------------------------------------------------------------------------


def decontamination_sql(
    table: str, k: int = 24, min_shared: int = 2, dialect: str = "spark"
) -> str:
    """Flag training documents sharing ≥ ``min_shared`` distinct character
    ``k``-gram shingles with a held-out benchmark set (every 25th doc) —
    the standard test-set-contamination sweep before a training run.

    Scale: both sides come from ONE shingle scan; the benchmark key set
    (distinct hashes of ~4% of docs) is orders smaller and broadcasts into
    the train-side probe, so the only wide shuffle is the final per-doc
    count. At 100 TB the benchmark set is a few GB of int64 — still
    broadcastable, else it degrades to a shuffle-hash semi join on int keys.
    """
    sh = shingle_hashes_sql(table, k, dialect)
    return f"""
WITH sh AS ({sh}),
bench AS (SELECT DISTINCT hg FROM sh WHERE doc_id % 25 = 0),
hits AS (
  SELECT s.doc_id, COUNT(*) AS shared_ngrams
  FROM sh s JOIN bench b ON s.hg = b.hg
  WHERE s.doc_id % 25 <> 0
  GROUP BY s.doc_id
)
SELECT doc_id, shared_ngrams FROM hits WHERE shared_ngrams >= {min_shared}
"""


register(
    "decontaminate_ngram",
    oracle=decontamination_sql("documents", dialect="duckdb"),
    tags=("llm", "dedup"),
)(_doc_case(decontamination_sql))


# --------------------------------------------------------------------------
# PII scrubbing (regex redaction at scan speed)
# --------------------------------------------------------------------------

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE = "\\+[0-9][0-9-]{7,}"
_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_scrub_sql(table: str, dialect: str = "spark") -> str:
    """Count and redact emails / phone numbers / IPv4s. The corpus is
    synthetic, so each doc is deterministically augmented with one of each
    PII form first (identically in both engines) — the case then verifies
    the detection counts AND the byte-exact redacted output (as md5, to
    keep the compared payload small).

    Scale: pure projection — regexp_replace chains stay in codegen; at
    100 TB this is scan-bound with zero shuffles and zero Python.
    """
    d = dialect
    aug = (
        "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
        " || '@mail.example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR)"
        " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
        if d == "duckdb"
        else "concat(text, ' Contact user', CAST(doc_id AS STRING),"
        " '@mail.example.com or +1-555-01', CAST(doc_id % 100 AS STRING),"
        " ' from 10.0.', CAST(doc_id % 256 AS STRING), '.7')"
    )
    scrub = _rx_replace_all(
        _rx_replace_all(_rx_replace_all("aug", _EMAIL, "<EMAIL>", d), _PHONE, "<PHONE>", d),
        _IP,
        "<IP>",
        d,
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS aug FROM {table})
SELECT doc_id,
       {_rx_count("aug", _EMAIL, d)} AS n_emails,
       {_rx_count("aug", _PHONE, d)} AS n_phones,
       {_rx_count("aug", _IP, d)} AS n_ips,
       MD5({scrub}) AS scrubbed_md5
FROM a
"""


register(
    "pii_scrub",
    oracle=pii_scrub_sql("documents", "duckdb"),
    tags=("llm", "text"),
)(_doc_case(pii_scrub_sql))


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------


def stratified_sample_sql(table: str, per_stratum: int = 12, dialect: str = "spark") -> str:
    """Top-``per_stratum`` documents per language by a portable 60-bit hash
    of doc_id — a deterministic, engine-independent stratified sample
    (reservoir-sampling semantics without randomness, so re-runs and
    backfills pick identical rows).

    Scale: one shuffle on the stratum key; per-stratum top-k is a window
    over each partition. For heavy skew (one stratum ≫ others), use the
    salted two-phase top-k pattern in operators/skew.py instead.
    """
    h = _hash60("CAST(doc_id AS VARCHAR)" if dialect == "duckdb" else "CAST(doc_id AS STRING)", dialect)
    return f"""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS sample_rank
  FROM {table}
) t
WHERE sample_rank <= {per_stratum}
"""


register(
    "sample_stratified",
    oracle=stratified_sample_sql("documents", dialect="duckdb"),
    tags=("llm", "text"),
)(_doc_case(stratified_sample_sql))


def temperature_sample_sql(table: str, budget: int = 200, dialect: str = "spark") -> str:
    """Temperature-scaled source mixing (the multilingual-LM rebalancing
    scheme: sample language i with probability ∝ p_i^α; α=1/2 here —
    square-root scaling — so low-resource languages are upweighted
    relative to their corpus share). Per-language quotas are computed from
    a fixed ``budget``, then filled by the rank-lowest docs under the
    portable 60-bit hash — a deterministic "random" sample whose re-runs
    and backfills pick identical rows.

    Cross-engine exactness: weights use FLOOR(SQRT(n)*1000) — IEEE-754
    requires sqrt and multiply to be correctly rounded, so both engines
    produce bit-identical doubles — and quotas use pure BIGINT division.
    No POWER(), whose rounding is implementation-defined.

    Scale: the count aggregate is |languages| rows (broadcast join back);
    the only big-data work is one window rank per language partition —
    same single-shuffle shape as sample_stratified. At 100 TB the quota
    table is still a few hundred bytes."""
    h = _hash60(
        "CAST(doc_id AS VARCHAR)" if dialect == "duckdb" else "CAST(doc_id AS STRING)",
        dialect,
    )
    idiv = "//" if dialect == "duckdb" else "DIV"
    return f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM {table} GROUP BY lang
),
weights AS (
  SELECT lang, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000) AS BIGINT) AS w
  FROM counts
),
quotas AS (
  SELECT lang, n_docs, CAST(({budget} * w) {idiv} SUM(w) OVER () AS BIGINT) AS quota
  FROM weights
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rk
  FROM {table}
)
SELECT r.doc_id, r.lang, q.n_docs AS source_docs, q.quota
FROM ranked r JOIN quotas q ON r.lang = q.lang
WHERE r.rk <= q.quota
"""


register(
    "sample_temperature",
    oracle=temperature_sample_sql("documents", dialect="duckdb"),
    tags=("llm", "text"),
)(_doc_case(temperature_sample_sql))


# --------------------------------------------------------------------------
# Length histogram (corpus profiling)
# --------------------------------------------------------------------------


def length_histogram_sql(table: str, n_buckets: int = 10, dialect: str = "spark") -> str:
    """Document-length histogram — the profiling scan every curation pass
    starts with. Spark uses the WIDTH_BUCKET builtin; DuckDB (which lacks
    it) computes the identical bucket arithmetically.

    Scale: one scan + one tiny aggregate keyed by bucket id (≤ n_buckets+2
    groups) — the histogram of a 100 TB corpus costs a single pass."""
    width = 500 // n_buckets
    if dialect == "duckdb":
        bucket = (
            f"CASE WHEN n_chars < 0 THEN 0 WHEN n_chars >= 500 THEN {n_buckets + 1}"
            f" ELSE CAST(n_chars // {width} AS INT) + 1 END"
        )
    else:
        bucket = f"CAST(WIDTH_BUCKET(n_chars, 0, 500, {n_buckets}) AS INT)"
    return f"""
SELECT bucket, COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM (SELECT {bucket} AS bucket, n_chars FROM {table}) b
GROUP BY bucket
"""


register(
    "text_length_histogram",
    oracle=length_histogram_sql("documents", dialect="duckdb"),
    tags=("llm", "text"),
)(_doc_case(length_histogram_sql))


# --------------------------------------------------------------------------
# C4-style line filtering (structural boilerplate removal)
# --------------------------------------------------------------------------


def line_filter_sql(table: str, width: int = 10, dialect: str = "spark") -> str:
    """C4-style per-line cleanup: segment each document into lines (the
    corpus has no newlines, so a line is a deterministic ``width``-word
    chunk — same synthetic-augmentation convention as ``pii_scrub``), then
    drop lines that are (a) ragged/too short, (b) contain a boilerplate
    marker token, or (c) too repetitive (low distinct-word count). Emits
    per-doc kept/dropped counts and the md5 of the reassembled cleaned text
    so the byte-exact output is verified, not just the counts.

    Scale: a PURE fused projection — chunking, per-line predicates, and
    reassembly are array higher-order functions inside whole-stage codegen;
    zero shuffles, zero Python. A 100 TB corpus pays exactly one scan.
    """
    d = dialect
    w = width
    if d == "duckdb":
        split = "string_split(text, ' ')"
        lls = (
            f"list_transform(generate_series(0, greatest((n_words + {w - 1}) // {w} - 1, 0)),"
            f" j -> list_slice(ws, j * {w} + 1, j * {w} + {w}))"
        )
        kept = (
            f"list_filter(lls, l -> len(l) = {w}"
            " AND NOT list_contains(l, 'slow')"
            " AND len(list_distinct(l)) >= 6)"
        )
        # array_to_string([]) is NULL in DuckDB but '' via Spark's array_join
        cleaned = "COALESCE(array_to_string(list_transform(kept, l -> array_to_string(l, ' ')), ' | '), '')"
        alen = "len"
    else:
        split = "split(text, ' ')"
        lls = (
            f"TRANSFORM(sequence(0, GREATEST((n_words + {w - 1}) DIV {w} - 1, 0)),"
            f" j -> SLICE(ws, j * {w} + 1, {w}))"
        )
        kept = (
            f"FILTER(lls, l -> SIZE(l) = {w}"
            " AND NOT ARRAY_CONTAINS(l, 'slow')"
            " AND SIZE(ARRAY_DISTINCT(l)) >= 6)"
        )
        cleaned = "ARRAY_JOIN(TRANSFORM(kept, l -> ARRAY_JOIN(l, ' ')), ' | ')"
        alen = "size"
    return f"""
WITH arr AS (
  SELECT doc_id, {split} AS ws, {alen}({split}) AS n_words FROM {table}
),
seg AS (SELECT doc_id, {lls} AS lls FROM arr),
kp AS (SELECT doc_id, {alen}(lls) AS n_lines, {kept} AS kept FROM seg)
SELECT doc_id, n_lines,
       {alen}(kept) AS n_kept,
       MD5({cleaned}) AS cleaned_md5
FROM kp
"""


register(
    "text_line_filter",
    oracle=line_filter_sql("documents", dialect="duckdb"),
    tags=("llm", "text"),
)(_doc_case(line_filter_sql))


# --------------------------------------------------------------------------
# Global paragraph-level exact dedup (RefinedWeb-style)
# --------------------------------------------------------------------------


def paragraph_dedup_sql(table: str, width: int = 25, dialect: str = "spark") -> str:
    """Corpus-global paragraph dedup: segment docs into paragraphs
    (``width``-word chunks — see line_filter_sql on the convention), keep
    only the FIRST occurrence of each distinct paragraph corpus-wide
    (ordered by doc_id then position — deterministic and re-run-stable),
    and reassemble each doc from its surviving paragraphs. Exact-duplicate
    docs keep zero paragraphs; partial overlaps survive partially — the
    RefinedWeb/C4 paragraph-granularity pass that exact doc-level dedup
    misses. Output verifies counts AND the reassembled bytes (md5).

    Scale: segmentation is projection-only; the dedup is ONE shuffle keyed
    on the paragraph hash (window rank=1 keeps the winner) and reassembly
    is one shuffle on doc_id. Both key spaces are as uniform as the data
    itself (paragraph hashes are md5s), so no salting is needed; at 100 TB
    this is two exchanges over |paragraphs| rows of (hash, doc_id, pos).
    """
    d = dialect
    w = width
    if d == "duckdb":
        split = "string_split(text, ' ')"
        alen = "len"
        paras = (
            f"list_transform(generate_series(0, greatest((n_words + {w - 1}) // {w} - 1, 0)),"
            f" j -> {{'pos': j, 'para': array_to_string(list_slice(ws, j * {w} + 1, j * {w} + {w}), ' ')}})"
        )
        lateral = "UNNEST(ps) AS _s(s)"
        reassemble = (
            "MD5(COALESCE(string_agg(para, ' | ' ORDER BY pos)"
            " FILTER (WHERE kept = 1), ''))"
        )
    else:
        split = "split(text, ' ')"
        alen = "size"
        paras = (
            f"TRANSFORM(sequence(0, GREATEST((n_words + {w - 1}) DIV {w} - 1, 0)),"
            f" j -> NAMED_STRUCT('pos', j, 'para', ARRAY_JOIN(SLICE(ws, j * {w} + 1, {w}), ' ')))"
        )
        lateral = "LATERAL EXPLODE(ps) AS _s(s)"
        reassemble = (
            "MD5(ARRAY_JOIN(TRANSFORM(ARRAY_SORT(COLLECT_LIST("
            "CASE WHEN kept = 1 THEN NAMED_STRUCT('pos', pos, 'para', para) END)),"
            " s -> s.para), ' | '))"
        )
    return f"""
WITH arr AS (
  SELECT doc_id, {split} AS ws, {alen}({split}) AS n_words FROM {table}
),
pr AS (SELECT doc_id, {paras} AS ps FROM arr),
ex AS (SELECT doc_id, s.pos AS pos, s.para AS para FROM pr, {lateral}),
rk AS (
  SELECT doc_id, pos, para,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY MD5(para) ORDER BY doc_id, pos) = 1
              THEN 1 ELSE 0 END AS kept
  FROM ex
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       {reassemble} AS kept_md5
FROM rk
GROUP BY doc_id
"""


register(
    "dedup_paragraph",
    oracle=paragraph_dedup_sql("documents", dialect="duckdb"),
    tags=("llm", "dedup"),
)(_doc_case(paragraph_dedup_sql))


# --------------------------------------------------------------------------
# Sequence packing (fixed-token-budget bin assignment)
# --------------------------------------------------------------------------


def pack_sequences_sql(
    table: str, budget: int = 2048, n_shards: int = 8, dialect: str = "spark"
) -> str:
    """Pack documents into fixed-token-budget training sequences: within
    each shard (deterministic doc_id hash bucket), docs are laid out in
    doc_id order and a doc starts the next bin when the running token total
    crosses the budget — the contiguous-packing pass that turns a curated
    corpus into fixed-length pretraining sequences. Emits per-bin document
    count, token total, and packed token count (capped at budget) so both
    the layout AND the truncation accounting are value-verified.

    Scale (100 TB): packing is inherently sequential, so it is sharded —
    the cumulative sum runs per shard (one window shuffle on the shard
    key), never globally; shards pack independently and in parallel, which
    is exactly how a 1000-executor layout pass must run. State per shard
    inside the window is O(1) (one running total).
    """
    d = dialect
    split = "string_split(text, ' ')" if d == "duckdb" else "split(text, ' ')"
    alen = "len" if d == "duckdb" else "size"
    intdiv = "//" if d == "duckdb" else "DIV"
    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {n_shards} AS shard, {alen}({split}) AS n_tokens
  FROM {table}
),
laid AS (
  SELECT shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM toks
),
binned AS (
  SELECT shard, doc_id, n_tokens,
         CAST((cum_tokens - n_tokens) {intdiv} {budget} AS BIGINT) AS bin
  FROM laid
)
SELECT shard, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM binned
GROUP BY shard, bin
"""


register(
    "pack_sequences",
    oracle=pack_sequences_sql("documents", dialect="duckdb"),
    tags=("llm", "text"),
)(_doc_case(pack_sequences_sql))


# --------------------------------------------------------------------------
# Corpus vocabulary (term frequencies + document frequencies, top-k)
# --------------------------------------------------------------------------


def corpus_vocab_sql(table: str, top_k: int = 20, dialect: str = "spark") -> str:
    """Corpus-level vocabulary statistics: per-term total frequency and
    document frequency, ranked; the tokenizer-training / vocab-audit scan
    (what BPE training and OOV analyses start from). Rank ties break by
    term so the top-k cut is deterministic in both engines.

    Scale: one explode + one (term) shuffle with map-side partial aggs;
    df comes from the same exchange via a per-(doc,term) pre-distinct in
    the projection (array_distinct before explode — no second shuffle).
    The global top-k is a TakeOrdered over |vocab| aggregates, not a sort
    of the corpus."""
    d = dialect
    if d == "duckdb":
        explode_all = (
            f"SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}"
        )
        explode_distinct = (
            f"SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term FROM {table}"
        )
    else:
        explode_all = (
            f"SELECT doc_id, explode(split(text, ' ')) AS term FROM {table}"
        )
        explode_distinct = (
            f"SELECT doc_id, explode(array_distinct(split(text, ' '))) AS term FROM {table}"
        )
    if d == "duckdb":
        return f"""
WITH tf AS (
  SELECT term, COUNT(*) AS term_freq FROM ({explode_all}) GROUP BY term
),
df AS (
  SELECT term, COUNT(*) AS doc_freq FROM ({explode_distinct}) GROUP BY term
)
SELECT term, term_freq, doc_freq, rnk FROM (
  SELECT tf.term, tf.term_freq, df.doc_freq,
         ROW_NUMBER() OVER (ORDER BY tf.term_freq DESC, tf.term) AS rnk
  FROM tf JOIN df ON tf.term = df.term
) t WHERE rnk <= {top_k}
"""
    # Spark: ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
    # prune, no global sort/window over |vocab|); the rank window then runs
    # over exactly top_k rows.
    return f"""
WITH tf AS (
  SELECT term, COUNT(*) AS term_freq FROM ({explode_all}) GROUP BY term
),
df AS (
  SELECT term, COUNT(*) AS doc_freq FROM ({explode_distinct}) GROUP BY term
),
topk AS (
  SELECT tf.term, tf.term_freq, df.doc_freq
  FROM tf JOIN df ON tf.term = df.term
  ORDER BY tf.term_freq DESC, tf.term
  LIMIT {top_k}
)
SELECT term, term_freq, doc_freq,
       ROW_NUMBER() OVER (ORDER BY term_freq DESC, term) AS rnk
FROM topk
"""


register(
    "corpus_vocab_topk",
    oracle=corpus_vocab_sql("documents", dialect="duckdb"),
    tags=("llm", "text"),
)(_doc_case(corpus_vocab_sql))
