"""Large-scale training-data pipeline operators.

Beyond the reference's own operator inventory (SURVEY §2), these are
the DataFrame-in/DataFrame-out operators a 100 TB training-data
pipeline needs: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language id, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.

All hot paths are JVM-side ``pyspark.sql.functions`` compositions; the
only Python execution is the (stubbed) multimodal decode, which uses
Arrow-batched ``mapInPandas``.
"""
