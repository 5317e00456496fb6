"""In-engine quality gate (SURVEY.md §2.4 A7).

The reference runs its gate OUTSIDE Spark — Airflow PythonOperator
probing Postgres (``Dag/E-commerce_dag.py:11-81``), halting the DAG via
ValueError. Here the same predicates are a single conditional-count
aggregation per table (operators.aggregates.quality_check) executed
in-engine between silver and gold; ``assert_quality`` raises on failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import assert_quality


def silver_gate(silver: dict[str, DataFrame]) -> None:
    """The reference's two probes, plus the invariants silver promises."""
    assert_quality(
        silver["order_items"],
        {
            "null_order_id": F.col("Ord_ID").isNull(),
            "null_product_id": F.col("Prod_ID").isNull(),
        },
    )
    assert_quality(
        silver["order_reviews"],
        {
            "null_review_id": F.col("Rev_ID").isNull(),
            "bad_review_id_length": F.length("Rev_ID") != 32,
            "score_out_of_range": ~F.col("Rev_Score").between(1, 5),
        },
    )
    assert_quality(
        silver["order_payments"],
        {"not_defined_payment": F.col("Payment_Type") == "not_defined"},
    )
