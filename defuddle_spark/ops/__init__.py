"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), similarity search (brute-force cosine top-k + LSH-bucketed),
text analysis (tokens, quality, language-id, fingerprints), and
multimodal binary-column plumbing. All hot paths are native Spark SQL
expressions; Python appears only in Arrow-batched pandas UDFs."""
