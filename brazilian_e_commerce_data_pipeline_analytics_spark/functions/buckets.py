"""Data-driven CASE/WHEN classifier builders (SURVEY.md §2.8 conditional).

The reference hard-codes nine when/otherwise chains across its gold layer
(``reporting.py:103-234``). Here one generic builder turns a spec —
ordered (condition, label) pairs — into the same chain, so each business
classification is a table of data, not code. All pure Column expressions:
JVM codegen, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def case_when(rules: Sequence[tuple[Column, str]], default: str) -> Column:
    """Ordered (condition, label) pairs -> when/otherwise chain."""
    expr: Column | None = None
    for cond, label in rules:
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def range_classifier(
    col: Column | str, bands: Sequence[tuple[int | float, int | float, str]], default: str
) -> Column:
    """Inclusive-range bands: (lo, hi, label)."""
    c = F.col(col) if isinstance(col, str) else col
    return case_when([(c.between(lo, hi), label) for lo, hi, label in bands], default)


def membership_classifier(
    col: Column | str, groups: Sequence[tuple[Sequence, str]], default: str
) -> Column:
    """Set-membership groups: (values, label)."""
    c = F.col(col) if isinstance(col, str) else col
    return case_when([(c.isin(*vals), label) for vals, label in groups], default)


# --- the reference's business vocabularies as data ------------------------

# Zip-prefix -> region (reporting.py:134-138, 167-171)
ZIP_REGION_BANDS = (
    (1000, 19999, "Southeast"),
    (20000, 39999, "Northeast"),
    (40000, 69999, "Southeast"),
    (70000, 99999, "Other"),
)

# BR state -> macro-region (reporting.py:183-188)
STATE_REGION_GROUPS = (
    (("SP", "RJ", "MG", "ES"), "Southeast"),
    (("BA", "SE", "PE", "AL", "PB", "RN", "CE", "PI", "MA"), "Northeast"),
    (("PR", "SC", "RS"), "South"),
    (("GO", "DF", "MT", "MS"), "Center-West"),
    (("AM", "RR", "AP", "PA", "TO", "RO", "AC"), "North"),
)

# Order status -> lifecycle category (reporting.py:198-201)
STATUS_CATEGORY_GROUPS = (
    (("delivered",), "Completed"),
    (("shipped", "processing"), "In Progress"),
    (("canceled", "unavailable"), "Failed"),
)

# Payment type -> category (reporting.py:211-214)
PAYMENT_CATEGORY_GROUPS = (
    (("credit_card", "debit_card"), "Card"),
    (("boleto",), "Bank Transfer"),
    (("voucher",), "Voucher"),
)

# Review score -> description / sentiment (reporting.py:224-234)
SCORE_DESCRIPTIONS = {1: "Very Poor", 2: "Poor", 3: "Average", 4: "Good", 5: "Excellent"}
SCORE_SENTIMENT_GROUPS = (((1, 2), "Negative"), ((3,), "Neutral"), ((4, 5), "Positive"))


def zip_region(col: Column | str) -> Column:
    return range_classifier(col, ZIP_REGION_BANDS, "Unknown")


def state_region(col: Column | str) -> Column:
    return membership_classifier(col, STATE_REGION_GROUPS, "Unknown")


def status_category(col: Column | str) -> Column:
    return membership_classifier(col, STATUS_CATEGORY_GROUPS, "Other")


def payment_category(col: Column | str) -> Column:
    return membership_classifier(col, PAYMENT_CATEGORY_GROUPS, "Other")


def score_description(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return case_when([(c == k, v) for k, v in SCORE_DESCRIPTIONS.items()], "Unknown")


def score_sentiment(col: Column | str) -> Column:
    return membership_classifier(col, SCORE_SENTIMENT_GROUPS, "Unknown")


def weight_class(col: Column | str) -> Column:
    """Product weight bands with NULL -> Unknown (reporting.py:151-154)."""
    c = F.col(col) if isinstance(col, str) else col
    return case_when(
        [(c < 500, "Light"), (c < 2000, "Medium"), (c >= 2000, "Heavy")], "Unknown"
    )


# Hour-of-day vocabularies (dim_time, reporting.py:96-122)

def hour_12(hour: Column) -> Column:
    return (
        F.when(hour == 0, 12).when(hour <= 12, hour).otherwise(hour - 12)
    )


def am_pm(hour: Column) -> Column:
    return F.when(hour < 12, "AM").otherwise("PM")


def time_period(hour: Column) -> Column:
    return case_when(
        [
            (hour.between(6, 11), "Morning"),
            (hour.between(12, 17), "Afternoon"),
            (hour.between(18, 21), "Evening"),
        ],
        "Night",
    )
