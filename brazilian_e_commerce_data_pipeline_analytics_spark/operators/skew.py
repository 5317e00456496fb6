"""Skew-mitigation operators (SURVEY.md §7.5 "salted/skew-aware joins").

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime, but two shapes still need explicit salting at 100 TB:

- **Aggregation on a skewed key** (one user/customer with 10^8 rows):
  a single reducer owns the hot key. :func:`salted_agg` runs the
  aggregation in two phases — partial agg on ``(key, salt)`` spreads the
  hot key over ``n_salts`` reducers, then a final agg on ``key`` merges
  the ``n_salts`` partials. Correct for any algebraic aggregate
  (sum/count/min/max); averages are computed as sum/count at the final
  step.
- **Join with a skewed probe side**: :func:`salted_join` salts the big
  side with ``rand(seed) * n_salts`` and explodes the small side once
  per salt value, so the hot key's rows land on ``n_salts`` different
  join tasks. The small side grows by ``n_salts`` x — use only when the
  small side is modest and AQE's runtime splitting is not available
  (e.g. broadcast is impossible and the skew is known up front).

Both produce results identical to their unsalted equivalents — salting
is a physical rewrite, not a semantic one — which is exactly what the
registered query q36 proves against a plain GROUP BY oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic salt: hash of the whole row spread over n_salts. rand()
# would also work physically but makes plans nondeterministic; hashing
# arbitrary "spreader" columns (e.g. the event id) keeps reruns and
# oracle comparisons exact.
_SALT = "__salt"


def _salt_col(spreader: Sequence[str], n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in spreader]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    spreader: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) where fn is one of
    ``sum | count | min | max | avg``. ``spreader`` columns (any
    high-cardinality column, e.g. a row id) determine the salt
    deterministically. Phase 1 shuffles on (keys + salt) — the hot key
    is spread over ``n_salts`` reducers; phase 2 shuffles ``n_salts``
    rows per key, negligible.
    """
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").cast("bigint").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            final_exprs.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
        else:
            raise ValueError(f"unsupported agg fn {fn!r}")
    salted = df.withColumn(_SALT, _salt_col(spreader, n_salts))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    spreader: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Every big-side row gets a deterministic salt in [0, n_salts); the
    small side is exploded once per salt value so each (key, salt)
    bucket finds its match. Output equals ``big.join(small, on, how)``
    exactly; only the shuffle distribution changes.

    Only big-side-preserving join types are allowed: right/full outer
    would emit each unmatched small row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join cannot express {how!r}: the replicated small side "
            "would duplicate its unmatched rows n_salts times"
        )
    big_salted = big.withColumn(_SALT, _salt_col(spreader, n_salts))
    small_rep = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_salted.join(small_rep, on=[*on, _SALT], how=how).drop(_SALT)
