"""Large-scale training-data pipeline operators.

Beyond the reference's surface: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.

Design rule: everything that can be expressed with built-in Spark SQL
functions is — hashing uses md5 (portable across engines for the oracle
gate) or xxhash64 (faster, JVM-side) — and Python only appears as
Arrow-batched pandas UDFs in the multimodal decode stubs.
"""
