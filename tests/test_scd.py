"""SCD type-2 merge semantics: versioning, closure, idempotence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from brazilian_e_commerce_data_pipeline_analytics_spark.operators.scd import scd2_merge

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)

DIM_SCHEMA = (
    "cust_id string, city string, segment string, "
    "valid_from timestamp, valid_to timestamp, is_current boolean"
)
UPD_SCHEMA = "cust_id string, city string, segment string, effective timestamp"


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, UPD_SCHEMA)


def _state(df):
    return {
        (r["cust_id"], r["valid_from"], r["valid_to"], r["is_current"]): (
            r["city"],
            r["segment"],
        )
        for r in df.collect()
    }


def test_scd2_versions_close_and_insert(spark):
    dim = _dim(
        spark,
        [
            ("c1", "Lisbon", "gold", T0, None, True),
            ("c2", "Porto", "silver", T0, None, True),
        ],
    )
    upd = _upd(
        spark,
        [
            ("c1", "Madrid", "gold", T1),   # changed city -> new version
            ("c2", "Porto", "silver", T1),  # unchanged -> no-op
            ("c3", "Braga", "bronze", T1),  # new key -> insert
        ],
    )
    out = scd2_merge(dim, upd, "cust_id", ["city", "segment"], "effective")
    st = _state(out)
    assert st[("c1", T0, T1, False)] == ("Lisbon", "gold")   # closed
    assert st[("c1", T1, None, True)] == ("Madrid", "gold")  # new version
    assert st[("c2", T0, None, True)] == ("Porto", "silver") # untouched
    assert st[("c3", T1, None, True)] == ("Braga", "bronze") # inserted
    assert len(st) == 4


def test_scd2_reapply_is_idempotent(spark):
    dim = _dim(spark, [("c1", "Lisbon", "gold", T0, None, True)])
    upd = _upd(spark, [("c1", "Madrid", "gold", T1)])
    once = scd2_merge(dim, upd, "cust_id", ["city", "segment"], "effective")
    twice = scd2_merge(once, upd, "cust_id", ["city", "segment"], "effective")
    assert _state(once) == _state(twice)


def test_scd2_latest_update_per_key_wins(spark):
    dim = _dim(spark, [("c1", "Lisbon", "gold", T0, None, True)])
    upd = _upd(
        spark,
        [("c1", "Madrid", "gold", T1), ("c1", "Paris", "gold", T2)],
    )
    out = scd2_merge(dim, upd, "cust_id", ["city", "segment"], "effective")
    st = _state(out)
    assert st[("c1", T2, None, True)] == ("Paris", "gold")
    assert st[("c1", T0, T2, False)] == ("Lisbon", "gold")
    assert len(st) == 2


def test_scd2_history_preserved(spark):
    dim = _dim(
        spark,
        [
            ("c1", "Lisbon", "gold", T0, T1, False),  # already-closed history
            ("c1", "Madrid", "gold", T1, None, True),
        ],
    )
    upd = _upd(spark, [("c1", "Paris", "platinum", T2)])
    out = scd2_merge(dim, upd, "cust_id", ["city", "segment"], "effective")
    st = _state(out)
    assert len(st) == 3
    assert st[("c1", T0, T1, False)] == ("Lisbon", "gold")
    assert st[("c1", T1, T2, False)] == ("Madrid", "gold")
    assert st[("c1", T2, None, True)] == ("Paris", "platinum")
