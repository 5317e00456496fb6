"""PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference e-commerce pipeline (see SURVEY.md), built
on the DataFrame/SQL API so Catalyst + Tungsten own the physical plan.

Subpackages
-----------
- ``sources``    readers/writers (parquet primary, csv/jdbc for parity)
- ``operators``  parameterized relational operators (SURVEY.md §2)
- ``functions``  scalar/date/bucketing helpers + cross-engine compat
- ``analytics``  dashboard-semantic query builders (YoY, top-k, % of total)
- ``pipeline``   medallion bronze→silver→gold pipeline (Olist-shaped)
- ``llm``        LLM-data-pipeline ops: dedup, similarity, text, multimodal
- ``streaming``  Structured Streaming variants (micro-batch, watermark)
- ``plans``      plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
