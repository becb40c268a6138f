"""Large-scale training-data pipeline operators (SURVEY §7.1 M9):
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, and multimodal column plumbing.

These extend the reference's surface (it has no analogue) and are
designed Spark-first: everything is expression/DataFrame algebra except
the genuinely imperative decode paths (Pandas-UDF over Arrow batches).
"""
