"""etl_wrap_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference framework rkapl123/ETL-Wrap (a Perl ETL
wrapper; see SURVEY.md).  The reference's semantics — declarative
file-format readers, string-first typing with target-driven coercion,
lookup enrichment, upsert/merge load semantics, a 36-function date/number
scalar library with holiday calendars, and a retry/gate pipeline runner —
are re-expressed here on the DataFrame API so Catalyst/Tungsten supply the
planning, pushdown, codegen and shuffle machinery the reference lacks.

Beyond reference parity it adds the operators a large-scale training-data
pipeline needs: deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, multimodal binary columns,
and text analysis — all designed for 100 TB scale (partition-aware, no
driver materialization, broadcast where small).
"""

from etl_wrap_spark.session import get_session, session_builder

__all__ = ["get_session", "session_builder"]
__version__ = "0.1.0"
