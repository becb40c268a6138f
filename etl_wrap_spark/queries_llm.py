"""Queries exercising the LLM-data-pipeline extension operators
(dedup, similarity search, text analysis) over documents/embeddings.

Populated alongside etl_wrap_spark.operators.*.
"""

from __future__ import annotations
