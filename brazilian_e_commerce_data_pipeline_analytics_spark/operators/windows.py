"""Window-function operators (SURVEY.md §2.5).

The reference imports ``Window`` and never uses it (``reporting.py:5``) —
its dashboards delegate YoY/top-k/%-of-total to Power BI. Here they are
first-class operators.

Scale notes:
- ``top_k`` (global top-k) deliberately avoids a single-partition window:
  ``orderBy(...).limit(k)`` lets Spark run TakeOrderedAndProject — per-
  partition top-k then a k-row merge on the driver, no global sort, no
  one-task window. We then re-rank the k survivors locally (k rows).
- ``top_k_per_group`` is the rank-over-partition form; the shuffle is on
  the group key, which is the same shuffle the metric aggregation already
  produced — Catalyst reuses the partitioning, no extra exchange.
- ``pct_of_total`` uses a scalar subquery-style cross join against a
  1-row aggregate rather than ``sum() OVER ()`` — an empty-frame window
  collapses every row into ONE partition (a 100-TB anti-pattern); the
  1-row broadcast join keeps the big side fully parallel.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cols(cs: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int, rank_col: str = "rank") -> DataFrame:
    """Global deterministic top-k. ``order_by`` must be a total order
    (include a unique tiebreaker) for oracle reproducibility."""
    order = _cols(order_by)
    pruned = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return pruned.withColumn(rank_col, F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*_cols(order_by))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def yoy(
    df: DataFrame,
    entity_cols: Sequence[str],
    period_col: str,
    metric_col: str,
    prev_alias: str = "prev_value",
    pct_alias: str = "yoy_pct",
) -> DataFrame:
    """Year-over-year: lag(metric) over (partition by entity order by
    period) + percent change. NULL for the first period, and NULL pct when
    the previous value is 0 (division yields NULL via nullif-style guard).
    """
    w = Window.partitionBy(*entity_cols).orderBy(F.col(period_col))
    prev = F.lag(F.col(metric_col), 1).over(w)
    pct = F.when(prev != 0, (F.col(metric_col) - prev) / prev * F.lit(100.0))
    return df.withColumn(prev_alias, prev).withColumn(pct_alias, pct)


def pct_of_total(
    df: DataFrame,
    metric_col: str,
    alias: str = "pct_of_total",
) -> DataFrame:
    """metric / sum(metric) * 100, computed via a broadcast 1-row total."""
    total = df.agg(F.sum(F.col(metric_col)).alias("__total"))
    out = df.crossJoin(F.broadcast(total))
    return out.withColumn(
        alias, F.col(metric_col) / F.col("__total") * F.lit(100.0)
    ).drop("__total")


def moving_sum_avg(
    df: DataFrame,
    order_col: str,
    metric_col: str,
    n: int,
    partition_by: Sequence[str] = (),
    sum_alias: str = "moving_sum",
    avg_alias: str = "moving_avg",
) -> DataFrame:
    """Trailing n-row moving sum/avg (rowsBetween -(n-1)..0).

    The metric is summed through DECIMAL so the sliding-frame arithmetic
    is exact and order-independent (Spark computes sliding sums
    incrementally with retractions; float retraction is not associative —
    decimal is). See functions/compat.py.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col(order_col))
        .rowsBetween(-(n - 1), 0)
    )
    dec = F.col(metric_col).cast("decimal(28,8)")
    msum = F.sum(dec).over(w).cast("double")
    mcount = F.count(dec).over(w)
    return df.withColumn(sum_alias, msum).withColumn(
        avg_alias, F.col(sum_alias) / mcount
    )


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out: str = "cum",
    exclusive: bool = False,
    n_parts: int | None = None,
) -> DataFrame:
    """Global running total WITHOUT a global single-task window.

    ``Window.orderBy(x)`` with no partitionBy funnels every row through
    ONE task — fine at test scale, fatal at 100 TB. This is the classic
    two-level distributed prefix sum instead:

    1. range-partition by ``order_col`` (global order becomes
       (partition_id, within-partition order)),
    2. per-partition running totals — parallel windows,
    3. per-partition totals (one row each) get a prefix via a window
       over n_parts rows — trivially single-task,
    4. broadcast-join the prefix back: cum = prefix + local.

    Output values are independent of where the range boundaries land,
    so the result is deterministic even though range partitioning
    samples. ``exclusive=True`` gives the sum of all STRICTLY preceding
    rows (0 for the first row) — the packing/offset convention.
    """
    return distributed_cumsums(
        df, order_col, [(value_col, out)], exclusive=exclusive, n_parts=n_parts
    )


def _check_reserved(df: DataFrame, names: Sequence[str]) -> None:
    """The two-level operators inject fixed temp columns; a caller
    relation already using one of those names would be silently
    corrupted (ADVICE r5). Fail loudly instead."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved temp names of "
            "the distributed window operators; rename them first"
        )


def distributed_cumsums(
    df: DataFrame,
    order_col: str,
    sums: Sequence[tuple[str, str]],
    exclusive: bool = False,
    n_parts: int | None = None,
) -> DataFrame:
    """Multi-column :func:`distributed_cumsum` — ONE range shuffle carries
    every ``(value_col, out_col)`` running total (q217 needs two cumulative
    curves over the same ordering; paying the exchange twice would be
    half-wasted work).

    Fault-tolerance note (ADVICE r5): the boundary-pinning
    ``localCheckpoint`` below stores blocks executor-locally — losing an
    executor mid-query fails the query (Spark resubmits it from the
    source on retry, so this is an availability cost, not a correctness
    one). On a real cluster at 100 TB, prefer reliable checkpointing
    (``spark.checkpoint`` to HDFS/S3 via ``sc.setCheckpointDir``) or
    persist(DISK_ONLY + replication) for long-running jobs; local[*]
    has a single "executor", so the tradeoff is moot in tests.
    """
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    outs = [out for _, out in sums]
    # The out names are reserved too (ADVICE r6, mirroring
    # distributed_rank's `out`/`total_out`): an out colliding with an
    # input column is silently replaced, and under exclusive=True an out
    # equal to a LATER entry's value_col would make that entry subtract
    # the already-overwritten column — wrong values, no error.
    if len(set(outs)) != len(outs):
        raise ValueError(f"duplicate out names in sums: {outs}")
    _check_reserved(
        df,
        ["__pid"]
        + outs
        + [f"__local{i}" for i in range(len(sums))]
        + [f"__ptotal{i}" for i in range(len(sums))]
        + [f"__prefix{i}" for i in range(len(sums))],
    )
    # localCheckpoint (lazy): the partitioned relation feeds TWO plan
    # branches (per-partition locals; per-partition totals), and without
    # a shared materialization Catalyst may plan the range exchange
    # TWICE — RangePartitioner samples its boundaries per exchange, so
    # the two branches can disagree on which partition a row belongs
    # to, silently corrupting prefix+local (caught by the sf0.1
    # scale-up sim on q164: gini varied run to run). Checkpointing pins
    # ONE set of sampled boundaries for both consumers.
    r = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = r
    for i, (value_col, _) in enumerate(sums):
        local = local.withColumn(f"__local{i}", F.sum(value_col).over(w_in))
    w_pid = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = (
        local.groupBy("__pid")
        .agg(*[F.sum(v).alias(f"__ptotal{i}") for i, (v, _) in enumerate(sums)])
        .select(
            "__pid",
            *[
                F.coalesce(F.sum(f"__ptotal{i}").over(w_pid), F.lit(0)).alias(
                    f"__prefix{i}"
                )
                for i in range(len(sums))
            ],
        )
    )
    joined = local.join(F.broadcast(prefixes), "__pid")
    drop = ["__pid"]
    for i, (value_col, out) in enumerate(sums):
        cum = F.col(f"__prefix{i}") + F.col(f"__local{i}")
        if exclusive:
            cum = cum - F.col(value_col)
        joined = joined.withColumn(out, cum)
        drop += [f"__local{i}", f"__prefix{i}"]
    return joined.drop(*drop)


def distributed_rank(
    df: DataFrame,
    order_by: Sequence[Column | str],
    out: str = "rank",
    total_out: str | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Global 1..n ``row_number`` under a TOTAL order without the
    single-task sort of ``Window.orderBy(...)``.

    ``order_by`` must be a total order (include a unique tiebreaker) —
    range partitioning keeps equal keys together, so with unique keys
    ``rank = partition prefix + local row_number`` is exact. Same
    two-level shape as :func:`distributed_cumsums`: range-partition,
    parallel per-partition ``row_number``, n_parts-row count-prefix
    window (trivially single-task), broadcast join back.

    ``total_out`` optionally emits the relation's total row count on
    every row (rides the same broadcast — no extra pass), which is what
    rank-derived statistics (ntile / percent_rank / cume_dist) need.

    Fault-tolerance: same ``localCheckpoint`` tradeoff as
    :func:`distributed_cumsums` — see its docstring.
    """
    order = _cols(order_by)
    n_parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    reserved = ["__pid", "__lrn", "__pn", "__prefix", out]
    if total_out is not None:
        reserved.append(total_out)
    _check_reserved(df, reserved)
    # localCheckpoint: same two-branch boundary pinning as
    # distributed_cumsums (locals + per-partition counts must agree on
    # the sampled range boundaries).
    r = (
        df.repartitionByRange(n_parts, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("__pid").orderBy(*order)
    local = r.withColumn("__lrn", F.row_number().over(w_in))
    w_pid = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__pn"))
    prefixes = counts.withColumn(
        "__prefix", F.coalesce(F.sum("__pn").over(w_pid), F.lit(0))
    )
    keep = ["__pid", "__prefix"]
    if total_out is not None:
        w_all = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        prefixes = prefixes.withColumn(total_out, F.sum("__pn").over(w_all))
        keep.append(total_out)
    joined = local.join(F.broadcast(prefixes.select(*keep)), "__pid")
    return joined.withColumn(out, F.col("__prefix") + F.col("__lrn")).drop(
        "__pid", "__lrn", "__prefix"
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integral division (SQL ``div`` / IntegralDivide). Plain
    ``/`` on longs goes through IEEE doubles, which stops being exact
    once the operands near 2^52 — a silent off-by-one in bucket math at
    extreme n (ADVICE r5). ``div`` stays in long arithmetic."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def ntile_expr(rank: Column, n: Column, k: int) -> Column:
    """SQL ``ntile(k)`` as a pure expression of an exact global ``rank``
    (1..n) and the total count ``n``: the first ``n % k`` buckets get
    ``n div k + 1`` rows, the rest ``n div k`` — identical to the window
    function on a total order, with no window involved. All arithmetic
    is integer-only (IntegralDivide), exact at any n."""
    base = _idiv(n, F.lit(k))
    rem = n % F.lit(k)
    threshold = rem * (base + F.lit(1))
    in_big = _idiv(rank + base, base + F.lit(1))
    in_small = rem + _idiv(rank - threshold + base - F.lit(1), base)
    return F.when(rank <= threshold, in_big).otherwise(in_small).cast("int")


def percent_rank_expr(rank: Column, n: Column) -> Column:
    """SQL ``percent_rank()`` from an exact global rank and total count:
    (rank-1)/(n-1), with the n=1 degenerate case pinned to 0.0 — the
    bare division is 0/0 = NULL on a one-row relation, where the window
    function is defined to return 0.0 (ADVICE r5)."""
    return F.when(
        n > F.lit(1), (rank - F.lit(1)) / (n - F.lit(1))
    ).otherwise(F.lit(0.0))


def cume_dist_expr(rank: Column, n: Column) -> Column:
    """SQL ``cume_dist()`` from an exact global rank (under a TOTAL
    order, where rank == peers-inclusive position) and total count."""
    return rank / n


def distributed_ntile(
    df: DataFrame,
    order_by: Sequence[Column | str],
    k: int,
    out: str,
    n_parts: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY ...)`` without the single-task global
    sort: :func:`distributed_rank` + :func:`ntile_expr`. ``order_by``
    must be a total order (window ntile on a non-total order is
    nondeterministic anyway, so this is no extra constraint)."""
    ranked = distributed_rank(
        df, order_by, out="__rank", total_out="__n", n_parts=n_parts
    )
    return ranked.withColumn(
        out, ntile_expr(F.col("__rank"), F.col("__n"), k)
    ).drop("__rank", "__n")
