"""Relational/windowed analytics operators over the TPC-H-ish tables.

These exercise the engine surface a data pipeline composes with the ML and
dedup stages: scan→filter→aggregate, broadcast joins + top-k, quantile
thresholding (the reference's O17/O18 on a SQL-checkable path), windowed
event aggregation, and gap-based sessionization (the batch twin of the
streaming sessionizer).

Money sums use exact DECIMAL casts (functions.money) — double summation is
partial-aggregation-order dependent and would not hash-match any oracle.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from spark_iforest_spark.functions import money_units, units_to_double

NANOS = 1_000_000_000


def _is_nanos(df: DataFrame, col: str) -> bool:
    """The synthetic parquet stores TIMESTAMP(NANOS) which Spark reads as
    BIGINT nanos under spark.sql.legacy.parquet.nanosAsLong — operators here
    accept either that or a real timestamp column."""
    return isinstance(df.schema[col].dataType, LongType)


def _epoch_ns(df: DataFrame, col: str) -> F.Column:
    if _is_nanos(df, col):
        return F.col(col)
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        # naive wall-clock arithmetic (timestampdiff on NTZ) — timezone-proof
        # epoch nanos, matching how DuckDB compares naive TIMESTAMPs; a cast
        # through TIMESTAMP_LTZ would shift by the session timezone
        return (
            F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
            * 1000
        )
    return F.unix_micros(F.col(col)) * 1000


def _epoch_s(df: DataFrame, col: str) -> F.Column:
    # `div` = exact integer division; float division of 1e18-scale nanos
    # loses ULPs and can flip the floor at second boundaries
    if _is_nanos(df, col):
        return F.expr(f"{col} div {NANOS}")
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        # NTZ cannot cast to BIGINT; wall-clock diff = naive-as-UTC epoch
        # seconds (truncating), consistent with _epoch_ns
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    return F.col(col).cast("long")


def _to_utc_ts(df: DataFrame, col: str) -> F.Column:
    """Epoch-preserving conversion of an event-time column to TIMESTAMP
    (LTZ), for operators that need a true timestamp (F.window, watermarks):
    bigint nanos truncate to micros; TIMESTAMP_NTZ reinterprets the naive
    value as UTC epoch (timezone-proof, the same reading _epoch_ns uses);
    TIMESTAMP passes through."""
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    if isinstance(dt, TimestampNTZType):
        return F.timestamp_micros(
            F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
            )
        )
    return F.col(col)


def _date_ns(day: str) -> int:
    return int(
        _dt.datetime.fromisoformat(day).replace(tzinfo=_dt.timezone.utc).timestamp()
    ) * NANOS


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-style pricing summary. Filter pushes to the parquet scan;
    aggregation is partial (map-side combine) then one shuffle on the tiny
    (returnflag, linestatus) key space."""
    if _is_nanos(lineitem, "l_shipdate"):
        li = lineitem.where(F.col("l_shipdate") < F.lit(_date_ns(ship_before)))
    elif isinstance(lineitem.schema["l_shipdate"].dataType, TimestampNTZType):
        # NTZ literal comparison — wall-clock, timezone-proof, pushes to scan
        li = lineitem.where(
            F.col("l_shipdate") < F.lit(ship_before).cast("timestamp_ntz")
        )
    else:
        li = lineitem.where(F.col("l_shipdate") < F.lit(ship_before).cast("timestamp"))
    disc_price = money_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = money_units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            units_to_double(F.sum(money_units("l_quantity"))).alias("sum_qty"),
            units_to_double(F.sum(money_units("l_extendedprice"))).alias("sum_base_price"),
            units_to_double(F.sum(disc_price)).alias("sum_disc_price"),
            units_to_double(F.sum(charge)).alias("sum_charge"),
            F.round(F.sum(money_units("l_quantity")) / F.lit(10000.0) / cnt, 6).alias("avg_qty"),
            F.round(F.sum(money_units("l_extendedprice")) / F.lit(10000.0) / cnt, 6).alias("avg_price"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    limit: int = 10,
) -> DataFrame:
    """TPC-H Q3-style: revenue top-k for one market segment.

    customer (small, filtered) broadcasts into orders; the orders→lineitem
    join shuffles on orderkey; top-k is a global sort of the aggregated
    (small) result with a deterministic orderkey tiebreak."""
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    revenue = money_units(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    # NTZ order dates render as naive strings — timezone-proof across engines
    odate = (
        F.expr(f"o_orderdate div {NANOS}")
        if _is_nanos(orders, "o_orderdate")
        else F.col("o_orderdate").cast("string")
    )
    return (
        orders.join(F.broadcast(c), orders["o_custkey"] == c["c_custkey"])
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(units_to_double(F.sum(revenue)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(limit)
        .select(
            "o_orderkey",
            odate.alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
    )


def exact_quantile(events: DataFrame, quantile: float, col: str = "value") -> float:
    """Exact interpolated quantile (Spark ``percentile``). NOTE the memory
    profile: exact percentile is an ObjectHashAggregate that buffers every
    value per partition — fine to tens of millions of rows, wrong at 100 TB.
    The scale path is :func:`sketch_quantile` (mergeable GK sketch, bounded
    memory), the same O17 choice the reference's model threshold uses."""
    return events.select(
        F.expr(f"percentile({col}, {quantile})").alias("thr")
    ).collect()[0]["thr"]


def sketch_quantile(
    events: DataFrame, quantile: float, col: str = "value", accuracy: int = 1_000_000
) -> float:
    """Mergeable-sketch quantile (``approx_percentile``, GK): bounded
    O(accuracy) memory per partition and a combine-able partial state — the
    100 TB twin of :func:`exact_quantile`. The sketch's rank error is at
    most n/accuracy, so for n < accuracy it returns exactly the smallest
    data value whose cumulative fraction >= quantile (the DISCRETE
    quantile, DuckDB's quantile_disc)."""
    return events.select(
        F.expr(f"approx_percentile({col}, {quantile}, {accuracy})").alias("thr")
    ).collect()[0]["thr"]


def _flag_above(events: DataFrame, thr: float) -> DataFrame:
    return events.where(F.col("value") > F.lit(thr)).select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round(F.lit(thr), 6).alias("threshold"),
    )


def _rate_by_type(events: DataFrame, thr: float) -> DataFrame:
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("value") > thr, 1).otherwise(0)).alias("n_anomalies"),
        F.round(
            F.sum(F.when(F.col("value") > thr, 1).otherwise(0)) / F.count(F.lit(1)),
            6,
        ).alias("anomaly_rate"),
    )


def value_threshold_anomalies(events: DataFrame, quantile: float = 0.99) -> DataFrame:
    """The reference's threshold flow (O17 quantile + O18 predicate) on a
    SQL-checkable column: flag events above the exact interpolated quantile.
    Exact percentile buffers all values (see :func:`exact_quantile`); use
    :func:`value_threshold_anomalies_approx` at scale."""
    return _flag_above(events, exact_quantile(events, quantile))


def value_threshold_anomalies_approx(
    events: DataFrame, quantile: float = 0.99, accuracy: int = 1_000_000
) -> DataFrame:
    """Scale-safe twin of :func:`value_threshold_anomalies`: the threshold
    comes from the mergeable GK sketch instead of the all-values-in-memory
    exact percentile. Oracle-checkable because the sketch is exact (discrete
    quantile) while n < accuracy."""
    return _flag_above(events, sketch_quantile(events, quantile, accuracy=accuracy))


def anomaly_rate_by_type(events: DataFrame, quantile: float = 0.99) -> DataFrame:
    """Summary aggregation (reference O19 numAnomalies, done the scalable way:
    conditional count per group, not collect().length). Threshold memory
    profile as in :func:`value_threshold_anomalies`."""
    return _rate_by_type(events, exact_quantile(events, quantile))


def anomaly_rate_by_type_approx(
    events: DataFrame, quantile: float = 0.99, accuracy: int = 1_000_000
) -> DataFrame:
    """Scale-safe twin of :func:`anomaly_rate_by_type` (GK-sketch threshold)."""
    return _rate_by_type(events, sketch_quantile(events, quantile, accuracy=accuracy))


def regional_supplier_rollup(
    supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Dimension-chain join (supplier -> nation -> region) + rollup. Both
    dims are tiny: broadcast-hash all the way, single shuffle for the agg."""
    return (
        supplier.join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            units_to_double(F.sum(money_units("s_acctbal"))).alias("sum_acctbal"),
        )
    )


def top_parts_per_brand(part: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k via ranking window: k priciest parts per brand.
    One shuffle on brand; rank + filter stay partition-local."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("price_rank", F.row_number().over(w))
        .where(F.col("price_rank") <= k)
        .select(
            "p_brand",
            "price_rank",
            "p_partkey",
            F.round("p_retailprice", 6).alias("p_retailprice"),
        )
    )


def event_type_cardinality(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Exact + approximate distinct-user counts per event type. The exact
    count shuffles every distinct (event_type, user_id) pair; the HLL++
    sketch (``approx_count_distinct``, relative std dev ``rsd``) is a
    constant-size mergeable state per group — the 100 TB path. The exact
    column is oracle-checked directly; the approx column via the
    event_type_cardinality_approx gate's |approx-exact| <= 3·rsd·exact
    invariant (HLL values themselves are implementation-specific)."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
        F.count(F.lit(1)).alias("n_events"),
    )


def windowed_event_agg(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window aggregation — identical code path works on a
    streaming DataFrame (see streaming/). Nanos input is truncated to
    micros for F.window; hour-bucket boundaries are unaffected."""
    ev = events.withColumn("_ts", _to_utc_ts(events, "ts"))
    return (
        ev.groupBy(F.window("_ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            units_to_double(F.sum(money_units("value", 6)), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when a user is
    idle longer than the gap. One shuffle on user_id; the window functions
    then run partition-local. Streaming twin: streaming.sessionize_stream."""
    ns = _epoch_ns(events, "ts")
    ev = events.withColumn("_ts_ns", ns)
    order = Window.partitionBy("user_id").orderBy("_ts_ns", "event_id")
    prev_ts = F.lag(F.col("_ts_ns")).over(order)
    new_session = F.when(
        prev_ts.isNull() | (F.col("_ts_ns") - prev_ts > gap_seconds * NANOS), 1
    ).otherwise(0)
    with_sess = ev.withColumn(
        "session_seq",
        F.sum(new_session).over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(f"min(_ts_ns) div {NANOS}").alias("session_start"),
            F.expr(f"max(_ts_ns) div {NANOS}").alias("session_end"),
            units_to_double(F.sum(money_units("value", 6)), 6).alias("sum_value"),
        )
    )


def event_type_pivot(
    events: DataFrame,
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> DataFrame:
    """Wide daily activity matrix: one row per day, one count column per
    event type (the dashboard/feature-store layout).

    Uses ``groupBy(day).pivot(type, values)`` with the value list given
    EXPLICITLY: Spark otherwise runs an extra distinct-scan job to discover
    the pivot columns, and the output schema would depend on the data — a
    schema-stability hazard in a pipeline (and a second pass at 100 TB).
    With fixed values the plan is a single aggregate whose shuffle key is
    the day (≈ one group per day — tiny); unseen types produce a 0 column,
    unexpected types are dropped (they'd otherwise silently widen the
    schema downstream)."""
    day = F.expr(f"_ts_s div 86400").alias("day")
    ev = events.withColumn("_ts_s", _epoch_s(events, "ts"))
    return (
        ev.groupBy(day)
        .pivot("event_type", list(types))
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )


def orders_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): every grouping-set combination —
    per-(status, priority) cells, per-status and per-priority margins, and
    the grand total — in ONE aggregation pass.

    ``cube()`` expands to grouping sets inside a single shuffle with
    map-side partial aggregation (4 aggregate rows per input row, but the
    post-shuffle key space is |status|×|priority| cells plus margins —
    still tiny). The alternative — four separate groupBy jobs unioned —
    scans the table four times; at 100 TB the single-pass cube is the only
    sane layout for a rollup dashboard. Aggregated-out dimensions are
    reported as '(all)' (the data's own values are never NULL here, so the
    marker is unambiguous); money sums use exact integer units."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            units_to_double(F.sum(money_units("o_totalprice"))).alias("sum_totalprice"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n_orders",
            "sum_totalprice",
        )
    )


def validate_table(df: DataFrame, rules: dict[str, F.Column]) -> DataFrame:
    """Single-pass data-quality validation: one row per rule with
    (rule, n_rows, n_violations, pass) — the expectations gate a pipeline
    runs before promoting a table (Deequ/Great-Expectations shape, but one
    declarative plan).

    Every rule is a boolean Column evaluated per row; a NULL verdict counts
    as a VIOLATION (a rule that can't prove itself passes, fails) — the
    conservative direction for data contracts. All rules aggregate in ONE
    scan (map-side partial agg of k counters, no shuffle of data rows); the
    per-rule layout comes from unpivoting the single result row with
    ``explode(array(struct(...)))`` — rule names travel as ``lit`` values,
    never interpolated into SQL text, so any name (quotes, commas) is safe.
    Adding a rule adds a counter, not a pass. At 100 TB this is strictly
    cheaper than k separate count jobs — the scan dominates and it happens
    once."""
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.when(cond, 0).otherwise(1)).alias(f"_v{i}")
        for i, cond in enumerate(rules.values())
    ]
    names = list(rules)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"), F.col(f"_v{i}").alias("n_violations")
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        df.agg(*aggs)
        .select(F.explode(pairs).alias("_p"), F.col("_n").alias("n_rows"))
        .select(
            F.col("_p.rule").alias("rule"),
            F.col("_p.n_violations").alias("n_violations"),
            "n_rows",
        )
        .select(
            "rule",
            "n_rows",
            F.col("n_violations").cast("long").alias("n_violations"),
            (F.col("n_violations") == 0).alias("pass"),
        )
    )


def event_time_rollup(events: DataFrame) -> DataFrame:
    """Multi-grain time rollup — the hypertable / continuous-aggregate
    layout: hour cells, day subtotals, and the grand total from ONE
    aggregation pass via ``rollup(day, hour)`` (grouping sets
    (day,hour),(day),()).

    The alternative — three groupBy jobs unioned — scans the table three
    times; ROLLUP expands grouping sets inside a single shuffle with
    map-side partial aggregation, and the post-shuffle key space is the
    hour count plus margins (tiny at any corpus size). Aggregated-out
    grains surface as -1 (epoch grains are never negative, so the sentinel
    is unambiguous and keeps the column type LONG instead of nullable);
    ``grain`` labels each row for downstream filters. Money-style integer
    micro-units make the sums order-independent and oracle-exact."""
    ev = events.withColumn("_ts_s", _epoch_s(events, "ts"))
    day = F.expr("_ts_s div 86400").alias("day")
    hour = F.expr("_ts_s div 3600").alias("hour")
    return (
        ev.rollup(day, hour)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            units_to_double(F.sum(money_units("value", 6)), 6).alias("sum_value"),
        )
        .select(
            F.when(F.col("hour").isNotNull(), F.lit("hour"))
            .when(F.col("day").isNotNull(), F.lit("day"))
            .otherwise(F.lit("total"))
            .alias("grain"),
            F.coalesce("day", F.lit(-1)).alias("day"),
            F.coalesce("hour", F.lit(-1)).alias("hour"),
            "n_events",
            "sum_value",
        )
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Current-state view: each user's most recent event (the classic
    changelog→snapshot compaction, e.g. CDC upsert resolution).

    One shuffle on user_id, then a partition-local row_number — Spark plans
    a WindowGroupLimit (rank-pushdown) so each partition keeps one running
    winner per user instead of sorting whole user histories. Ties on ts
    break by event_id desc, making the winner total and deterministic.
    At 100 TB this beats the groupBy(max(struct(ts, ...))) idiom only in
    readability — both shuffle the same rows; the window form keeps ALL
    payload columns without packing them into the max struct."""
    ns = _epoch_ns(events, "ts")
    w = Window.partitionBy("user_id").orderBy(
        F.col("_ts_ns").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("_ts_ns", ns)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.expr(f"_ts_ns div {NANOS}").alias("ts_s"),
            "event_type",
            "value",
        )
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, min_totalprice: float = 300000.0
) -> DataFrame:
    """Set-difference surface: customers with no order above a price
    threshold (anti join — the EXCEPT of the key space). The filter on the
    right side pushes to the orders scan before the join."""
    big = orders.where(F.col("o_totalprice") > min_totalprice)
    return (
        customer.join(big, customer["c_custkey"] == big["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def table_profile(df: DataFrame, columns: list[str], scale: int = 4) -> DataFrame:
    """Single-scan numeric column profiler (the ANALYZE/data-triage view):
    one row per column with count / nulls / min / max / exact fixed-point
    mean. All statistics come out of ONE aggregate over one scan — 4×N
    partial states, not N passes — then a constant-size explode unpivots
    the single result row. Mean uses integer units (money_units) so it is
    bit-stable under any partial-aggregation order, which is what lets the
    oracle pin it exactly."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
            F.sum(money_units(c, scale)).alias(f"{c}__units"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.round(
                units_to_double(F.col(f"{c}__units"), scale) / F.col(f"{c}__n"), 6
            ).alias("mean_value"),
        )
        for c in columns
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def profile_partial(df: DataFrame, columns: list[str], scale: int = 4) -> DataFrame:
    """Mergeable shard state for :func:`table_profile`: the same
    single-scan aggregate, but emitting the raw fixed-point ``sum_units``
    instead of the finalized mean — (column, n_rows, n_nulls, min_value,
    max_value, sum_units), one row per column.

    This is the 100 TB steady state for corpus monitoring: profile each
    arriving shard (a day, a crawl, a partition) ONCE, persist the tiny
    per-shard relation, and fold any subset with :func:`merge_profiles`
    without ever rescanning old data. Every statistic is chosen to be
    associatively mergeable with EXACT results: counts and integer-unit
    sums add, and per-shard ``round(min, 6)`` commutes with the global
    min (round is monotone), so merge(partials) == one-shot
    table_profile bit-for-bit (pytest-pinned; the merged relation also
    hash-matches table_profile's DuckDB oracle)."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
            F.sum(money_units(c, scale)).alias(f"{c}__units"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
            F.col(f"{c}__units").alias("sum_units"),
        )
        for c in columns
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def merge_profile_partials(partials: DataFrame) -> DataFrame:
    """Fold :func:`profile_partial` shard relations into ONE relation of
    the SAME partial schema — the re-mergeable intermediate
    :func:`merge_profiles` cannot produce (it finalizes the mean, losing
    ``sum_units``). This is what an incremental/streaming maintainer folds
    per batch and what a shard-tree fold passes between levels: integer
    sums and monotone-rounded min/max make the fold associative and
    lossless, so any fold shape finalizes to the identical one-shot
    profile (pytest-pinned)."""
    return partials.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.sum("sum_units").alias("sum_units"),
    )


def finalize_profile(partials: DataFrame, scale: int = 4) -> DataFrame:
    """Finalize a partial-schema relation (one row per column — fold
    first with :func:`merge_profile_partials` if holding shard rows) to
    :func:`table_profile`'s exact output schema, with the same rounding
    as the one-shot path."""
    return partials.select(
        "column",
        "n_rows",
        "n_nulls",
        "min_value",
        "max_value",
        F.round(
            units_to_double(F.col("sum_units"), scale) / F.col("n_rows"), 6
        ).alias("mean_value"),
    )


def merge_profiles(partials: DataFrame, scale: int = 4) -> DataFrame:
    """Fold :func:`profile_partial` shard relations (union any number of
    them first) into :func:`table_profile`'s exact output schema. Integer
    sums make the fold order-independent; the mean is finalized here with
    the same rounding as the one-shot path, so the result is bit-equal to
    profiling the concatenated shards directly. An all-NULL column merges
    to NULL min/max/mean exactly like the one-shot scan (sum skips NULL
    shard states; 0-count division yields NULL)."""
    return partials.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.round(
            units_to_double(F.sum("sum_units"), scale) / F.sum("n_rows"), 6
        ).alias("mean_value"),
    )


_NDV_SKETCHABLE = {"tinyint", "smallint", "int", "bigint", "string", "binary"}


def _ndv_check_columns(df: DataFrame, columns: list[str]) -> None:
    """Datasketches HLL hashes raw int/string/binary values; floating-point
    and decimal columns are refused rather than silently canonicalized —
    picking a canonical form (fixed-point units, a string rendering) changes
    which values count as distinct, so that decision belongs to the caller
    (e.g. ``money_units(c)`` before sketching a price column)."""
    for c in columns:
        t = df.schema[c].dataType.simpleString()
        if t not in _NDV_SKETCHABLE:
            raise ValueError(
                f"ndv sketch column {c!r} has type {t}; supported types are "
                f"{sorted(_NDV_SKETCHABLE)} — cast explicitly first (for "
                "floats/decimals pick a canonicalization, e.g. money_units)"
            )


def ndv_sketch_partial(
    df: DataFrame,
    columns: list[str],
    lg_k: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable per-shard distinct-count state: one Datasketches HLL sketch
    per column from ONE scan — (column, sketch), the statistic
    :func:`profile_partial` structurally cannot carry (counts and integer
    sums fold by addition, but a distinct count of a union is not a function
    of the shards' distinct counts; the sketch's register state IS the
    foldable sufficient statistic).

    This completes the shard-by-shard profile story at 100 TB: sketch each
    arriving shard once (2^lg_k registers ≈ 4 KB at the default lg_k=12,
    rel. std. err. ≈ 1.04/√2^lg_k ≈ 1.6%), persist the tiny (column, binary)
    relation next to the profile_partial rows, and fold any subset with
    :func:`merge_ndv_sketches` without rescanning old shards.

    Accuracy contract: the union of shard sketches and the one-shot sketch
    agree on the underlying SET exactly, but the ESTIMATE is not guaranteed
    bit-equal between the two paths (HLL_4 union promotes through an HLL_8
    gadget, and partial-aggregation layout shifts the sparse→dense
    transition), so downstream checks pin bounded relative error, never raw
    estimate equality — the driver gate's ndv variant pins the one-shot and
    merged estimates within 8% of the exact NDV (≈5σ at lg_k=12) and within
    3% of each other.

    ``group_cols`` adds a grouped dimension — one sketch per (group,
    column), e.g. distinct users per event_type per daily shard — still
    ONE map-side-combined aggregate over one scan (state = groups ×
    columns × 4 KB); fold with ``merge_ndv_sketches(parts,
    group_cols=...)``, where groups absent from a shard simply contribute
    no row."""
    _ndv_check_columns(df, columns)
    group_cols = list(group_cols or [])
    row = (df.groupBy(*group_cols) if group_cols else df.groupBy()).agg(
        *[F.hll_sketch_agg(c, lg_k).alias(f"{c}__sk") for c in columns]
    )
    structs = [
        F.struct(
            F.lit(c).alias("column"), F.col(f"{c}__sk").alias("sketch")
        )
        for c in columns
    ]
    return row.select(
        *group_cols, F.explode(F.array(*structs)).alias("p")
    ).select(*group_cols, "p.*")


def merge_ndv_sketches(
    partials: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Fold :func:`ndv_sketch_partial` shard relations (union any number of
    them first) into one sketch per (group,) column. lg_k must match across
    shards — ``allowDifferentLgConfigK`` stays False so a mixed-precision
    merge fails loudly instead of silently downgrading every estimate to
    the coarsest shard (the same must-match posture as the substr window
    index)."""
    return partials.groupBy(*(group_cols or []), "column").agg(
        F.hll_union_agg("sketch", allowDifferentLgConfigK=False).alias("sketch")
    )


def ndv_estimates(sketches: DataFrame) -> DataFrame:
    """Finalize sketch rows to estimates: ``sketch`` → ``ndv``, any group
    columns carried through."""
    others = [c for c in sketches.columns if c != "sketch"]
    return sketches.select(
        *others, F.hll_sketch_estimate("sketch").alias("ndv")
    )


def approx_ndv(
    df: DataFrame,
    columns: list[str],
    lg_k: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-shot approximate distinct counts: ((group,) column, ndv) from
    one scan. The single-table convenience face of the sketch family
    above — same accuracy contract, no persisted artifact."""
    return ndv_estimates(ndv_sketch_partial(df, columns, lg_k, group_cols))


def exact_ndv(df: DataFrame, columns: list[str]) -> DataFrame:
    """Exact distinct counts, (column, ndv) — one aggregate with N
    count(DISTINCT) columns (expect one expand + shuffle per distinct
    column; this is the anchor/triage path, not the 100 TB steady state —
    that is the sketch family above)."""
    row = df.agg(
        *[F.countDistinct(c).alias(f"{c}__n") for c in columns]
    )
    structs = [
        F.struct(F.lit(c).alias("column"), F.col(f"{c}__n").alias("ndv"))
        for c in columns
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: scatter left rows across ``salt`` sub-keys
    (deterministic hash of the whole left row) and replicate the right side
    ``salt``× so every sub-key still sees all its matches. A hot key's rows
    then spread over ``salt`` tasks instead of one straggler.

    The result is EXACTLY the plain inner join (every left row carries one
    sub-key; the right side covers all of them) — asserted by test and by
    the driver gate's plain-SQL oracle. Cost: ``salt``× the right side
    through the shuffle. Use when the hot side is too big to broadcast and
    the other side is small enough to replicate; for moderate skew prefer
    AQE's runtime skew-join split, which needs no replication at all.
    """
    lcols = [F.col(c) for c in left.columns]
    l = left.withColumn("_salt", F.pmod(F.xxhash64(*lcols), F.lit(salt)))
    r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    cond = (l[left_on] == r[right_on]) & (l["_salt"] == r["_salt"])
    return l.join(r, cond).select(
        *[l[c] for c in left.columns], *[r[c] for c in right.columns]
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Join/aggregation skew diagnostic for a key column: the ``top_k``
    hottest keys with their share of the table and the skew factor
    (key count / mean count per key) — the number that decides between a
    plain shuffle join, AQE's runtime skew split, and ``salted_join``
    (rule of thumb: factor ≳ partitions means one task owns the key's
    whole shuffle slice; salt ≈ ceil(factor / partitions) spreads it).

    One groupBy (map-side combined), a one-row totals aggregate broadcast
    back over the counts, and a TakeOrdered top-k — shuffle width is the
    distinct-key count, never the table, and no stage funnels the counts
    relation through a single partition (a global window would, which
    matters exactly when the key is high-cardinality).

    Returns (key, n_rows, frac_of_table, skew_factor), hottest first.
    """
    # no materialization at all (round-7 review fix — a cache() here had
    # no unpersist hook and pinned CacheManager entries for the session):
    # the counts aggregate appears twice in ONE plan (totals branch +
    # final projection), so Spark's ReuseExchange computes the groupBy
    # shuffle once and both branches read it (plan-asserted in
    # test_relational_plans) — the reuse a localCheckpoint/cache was
    # simulating, without pinning anything beyond the query's lifetime.
    # CONTRACT: with spark.sql.exchangeReuseEnabled=false the two
    # branches recompute `df` independently — feed a DETERMINISTIC
    # relation (seeded sample / persisted input) in that configuration,
    # same as every oracle-checked operator here assumes
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.desc("n_rows"), "key")
        .limit(top_k)
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("frac_of_table"),
            F.round(
                F.col("n_rows") / (F.col("_total") / F.col("_n_keys")), 6
            ).alias("skew_factor"),
        )
    )


def group_quantiles(
    events: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_col: str = "event_type",
    col: str = "value",
    accuracy: int = 1_000_000,
) -> DataFrame:
    """Per-group quantiles via the mergeable GK sketch (``approx_percentile``
    grouped) — one shuffle on the group key, O(accuracy) state per group, the
    way per-segment latency/size percentiles are computed at 100 TB. Exact
    (discrete quantile) while each group's n <= accuracy, which is what lets
    the quantile_disc oracle pin it bit-for-bit at test scale."""
    aggs = [
        F.round(
            F.expr(f"approx_percentile({col}, {q}, {accuracy})"), 6
        ).alias(f"p{str(q)[2:]}")
        for q in quantiles
    ]
    return events.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), *aggs
    )


def rolling_event_stats(
    events: DataFrame, window_rows: int = 5
) -> DataFrame:
    """Per-user trailing-window statistics: each event annotated with the
    count and fixed-point mean of its user's previous ``window_rows`` values
    (event itself excluded) — the feature-engineering shape for "recent
    behavior" signals. One shuffle on user_id; the rows-frame window then
    runs partition-local, state bounded by window_rows."""
    order = Window.partitionBy("user_id").orderBy(
        _epoch_ns(events, "ts"), "event_id"
    )
    frame = order.rowsBetween(-window_rows, -1)
    n_prev = F.count(F.lit(1)).over(frame)
    sum_prev = F.sum(money_units("value", 6)).over(frame)
    return events.select(
        "event_id",
        "user_id",
        n_prev.alias("n_prev"),
        F.when(n_prev > 0, F.round(units_to_double(sum_prev, 6) / n_prev, 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("mean_prev_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Point-in-time (as-of) join: attach to every left row the payload of
    the LATEST right row with the same key and ``right_ts <= left_ts``
    (left-outer: NULL payload when no right row precedes).

    Spark-first plan — the naive formulation (equi-join on key + range
    predicate + max-per-left-row) materializes |L|x|R| pairs per key before
    reducing; at 100 TB that join is the whole job. Instead both sides union
    into one relation, shuffle ONCE on the key, and a running
    ``last(payload, ignorenulls)`` window fills each left row from the
    nearest preceding right row: one exchange + one sort, O(n log n) per
    key, zero pair blow-up — the temporal-join shape used by kdb asof and
    Flink temporal tables.

    Determinism: right rows sharing (key, ts) are collapsed first, keeping
    the row with the greatest ``tiebreak`` (default: first payload column),
    so the window's answer never depends on shuffle order. At equal
    timestamps the right row sorts BEFORE the left row (inclusive <=
    semantics, matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).
    """
    tb = tiebreak or payload[0]
    r = right.select(
        F.col(right_on).alias("_k"),
        _epoch_ns(right, right_ts).alias("_t"),
        *[F.col(c) for c in payload],
    )
    rw = Window.partitionBy("_k", "_t").orderBy(F.col(tb).desc())
    r1 = (
        r.withColumn("_rn", F.row_number().over(rw))
        .where(F.col("_rn") == 1)
        .select("_k", "_t", F.struct(*[F.col(c) for c in payload]).alias("_p"))
    )
    l1 = left.select(
        F.col(left_on).alias("_k"),
        _epoch_ns(left, left_ts).alias("_t"),
        F.lit(None).cast(r1.schema["_p"].dataType).alias("_p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r2 = r1.withColumn("_l", F.lit(None).cast(l1.schema["_l"].dataType))
    u = l1.unionByName(r2).withColumn("_side", F.col("_l").isNotNull().cast("int"))
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_fp", F.last("_p", ignorenulls=True).over(w))
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_fp.{c}").alias(c) for c in payload],
    )


def event_follow_counts(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Time-range self-join: how often does event type B follow event type A
    from the same user within ``gap_seconds``? Returns (lead_type,
    follow_type, n_pairs).

    Scale shape: the range predicate ``0 < b.ts - a.ts <= gap`` is NOT an
    equi-join, and Spark's fallback for it is a broadcast-nested-loop — dead
    at 100 TB. Bucketizing ts into gap-sized bins makes it one: a follower
    within ``gap`` of a lead lives either in the lead's bin or the next one,
    so the lead side explodes to exactly 2 (user, bucket) keys and the join
    is a plain shuffled equi-join with the exact range check applied
    post-join. Cost: 2x one side, vs |events_per_user|^2 for the naive plan.

    Pairs at identical timestamps are excluded (strict >) so the count never
    depends on tie order.
    """
    gap_ns = gap_seconds * NANOS
    base = events.select(
        "user_id",
        _epoch_ns(events, "ts").alias("_t"),
        "event_id",
        "event_type",
    )
    lead = base.select(
        "user_id",
        F.col("_t").alias("_lead_t"),
        F.col("event_type").alias("lead_type"),
        # integer div — float division of 1e18-scale nanos loses ULPs and
        # can flip the bucket at a bin boundary
        F.explode(
            F.array(
                F.expr(f"_t div {gap_ns}"),
                F.expr(f"_t div {gap_ns}") + 1,
            )
        ).alias("_bucket"),
    )
    follow = base.select(
        "user_id",
        F.col("_t").alias("_follow_t"),
        F.col("event_type").alias("follow_type"),
        F.expr(f"_t div {gap_ns}").alias("_bucket"),
    )
    return (
        lead.join(follow, ["user_id", "_bucket"])
        .where(
            (F.col("_follow_t") > F.col("_lead_t"))
            & (F.col("_follow_t") - F.col("_lead_t") <= gap_ns)
        )
        .groupBy("lead_type", "follow_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def event_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured column handling: extract the JSON ``props.k`` field
    scan-side (get_json_object stays in codegen) and aggregate it per event
    type. The pattern for metadata-bearing event streams at scale: parse
    only the fields the query touches, never materialize whole documents."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
