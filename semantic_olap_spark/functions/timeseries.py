"""Time-series reshaping: resample with gap-fill, LOCF forward-fill.

OLAP over event data constantly needs a *dense* time axis — a chart
or a join against another series breaks on missing periods — and a
carried-forward reading for sparse sensors/slowly-changing values.
The reference has no time semantics at all (SURVEY.md §1.2: dates
are strings filtered by LLM/regex); Spark has the primitives but not
the operators.  Both here are deterministic compositions with exact
ANSI-SQL mirrors (DuckDB ``generate_series`` / ``IGNORE NULLS``).

100 TB posture:

- :func:`resample` aggregates first (shuffle carries one row per
  (group, bucket) — never per event), then densifies by exploding a
  per-group ``sequence(min, max, step)`` — output is bounded by
  #groups × horizon, and the spine build reuses the aggregated
  frame (a self-agg + broadcast-friendly join on the group key).
- :func:`ffill` is one window per group ordered by time using
  ``last(col, ignorenulls=True)`` with an unbounded-preceding frame
  — a single shuffle on the group key; state per task is one value
  per column, independent of window length.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from semantic_olap_spark.operators.deterministic import AGGS

__all__ = [
    "detect_anomalies", "ffill", "resample", "rolling_agg", "sessionize",
]

_STEPS = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 7 days",
}

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}

# NTZ epoch anchor for tz-free wall-clock arithmetic (see ts_micros)
_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def naive_micros_sql(col_sql: str) -> str:
    """SQL fragment: micros-since-epoch of an NTZ wall-clock, by pure
    FIELD EXTRACTION — never by interpretation into an instant.

    ``timestampdiff``/``unix_micros`` silently coerce NTZ operands
    through the session TimestampType (verified on Spark 4.1: the
    physical plan shows ``cast(ts as timestamp) ... Some(<session
    tz>)``), which shifts spring-forward gap wall-clocks by an hour
    under a DST-observing session zone.  ``unix_date``/``hour``/
    ``minute``/``extract(SECOND)`` on NTZ read the stored wall-clock
    fields directly, so this fragment is a pure function of the
    value.  BIGINT casts keep ANSI multiplication out of int32;
    extract(SECOND) is DECIMAL(8,6) so sub-second survives exactly.
    """
    c = col_sql
    return (
        f"(cast(unix_date(cast({c} as date)) as bigint) * 86400000000"
        f" + cast(hour({c}) * 3600 + minute({c}) * 60 as bigint)"
        f" * 1000000"
        f" + cast(extract(SECOND FROM {c}) * 1000000 as bigint))"
    )


def ts_micros(df: DataFrame, ts_col: str):
    """Microseconds-since-epoch of ``ts_col`` under the column's OWN
    semantics — the engine-wide epoch key for range windows and gap
    arithmetic.

    - TIMESTAMP_NTZ (tz-naive, the parquet-source shape): *naive
      wall-clock* micros via :func:`naive_micros_sql` field
      extraction — a pure function of the stored value, invariant to
      the session timezone, and safe across DST transitions (no
      interpretation into instants ever happens, so the spring-
      forward gap can't shift values and wall-clock deltas match the
      naive-SQL oracle).  ``unix_micros(cast(ts))`` — and even
      ``timestampdiff`` on NTZ operands — would instead interpret
      the wall-clock in the session zone: under a non-UTC zone,
      deltas across a transition come out ±1h vs the oracle, and
      nonexistent gap wall-clocks get silently shifted (proven by
      tests/test_dst_timestamps.py).
    - TIMESTAMP (a real instant): absolute micros, unchanged.
    - anything else (string/date): cast to timestamp first, as
      before.
    """
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return F.expr(naive_micros_sql(f"`{ts_col}`"))
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _bucket_expr(df: DataFrame, ts_col: str, step: str):
    """Truncate ``ts_col`` to ``step`` under the column's own
    semantics: NTZ columns truncate on the naive wall-clock (pure
    micros arithmetic — Spark's ``date_trunc`` would coerce NTZ to
    the session TimestampType, reintroducing the DST sensitivity
    ``ts_micros`` exists to avoid); instants keep ``date_trunc``.
    """
    from pyspark.sql import types as T

    if not isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return F.date_trunc(step, F.col(ts_col))
    unit = {
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 604_800_000_000,
    }[step]
    # week origin 1969-12-29 (a Monday, matching date_trunc's
    # Monday-start weeks); hour/day align to the epoch itself.
    # naive micros by field extraction (NOT timestampdiff — it
    # coerces NTZ through the session zone, see naive_micros_sql);
    # timestampadd on an NTZ anchor is pure wall-clock arithmetic,
    # so the rebuild is tz-free too.
    origin = -259_200_000_000 if step == "week" else 0
    us = naive_micros_sql(f"`{ts_col}`")
    return F.expr(
        f"timestampadd(MICROSECOND, "
        f"{us} - pmod({us} - {origin}, {unit}), {_EPOCH_NTZ})"
    )


def _parse_duration(spec: str, what: str) -> int:
    """'7 days' / '30 minutes' → seconds (shared by rolling_agg and
    sessionize)."""
    parts = spec.split()
    if len(parts) != 2 or not parts[0].isdigit():
        raise ValueError(f"{what} must look like '7 days', got {spec!r}")
    amount, unit = int(parts[0]), parts[1].rstrip("s")
    seconds = _UNIT_SECONDS.get(unit)
    if seconds is None:
        raise ValueError(f"unsupported {what} unit {unit!r}")
    return amount * seconds


def resample(
    df: DataFrame,
    ts_col: str,
    step: str = "day",
    group_by: str | Sequence[str] | None = None,
    value_col: str | None = None,
    agg: str = "sum",
    fill: float | None = None,
) -> DataFrame:
    """Dense per-period aggregates: one row per (group, period),
    including empty periods between each group's first and last event.

    Output: ``(keys..., period, n_events, {agg}_{value_col}?)``.
    Empty periods have ``n_events = 0`` and value ``fill`` (NULL by
    default).  ``step`` ∈ hour/day/week.
    """
    if step not in _STEPS:
        raise ValueError(f"step must be one of {sorted(_STEPS)}")
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    bucket = _bucket_expr(df, ts_col, step)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        if agg not in AGGS:
            raise ValueError(f"unknown agg {agg!r}")
        aggs.append(
            AGGS[agg](F.col(value_col).try_cast("double")).alias(
                f"{agg}_{value_col}"
            )
        )
    dense = df.groupBy(*keys, bucket.alias("period")).agg(*aggs)

    # gap fill in ONE pass over the aggregated frame: each row looks
    # at its group's NEXT period (lead) and explodes the run of empty
    # periods between itself and that neighbor.  The former
    # spine-and-join construction re-aggregated `dense` for the
    # bounds, and because the two branches share lineage Catalyst
    # re-executed the FACT scan + aggregation for each — two full
    # fact scans where one suffices (the difference that matters at
    # 100 TB).  The lead window shuffles only the aggregated frame
    # (one row per group-period).  Re-anchoring the sequence at every
    # real bucket also makes the fill robust to step-alignment drift
    # a single min→max sequence could accumulate.
    step_expr = F.expr(_STEPS[step])
    if keys:
        w = Window.partitionBy(*keys).orderBy("period")
    else:
        # ungrouped: `dense` is one row per period — cardinality is
        # bounded by the TIME RANGE, not the data, so a constant
        # partition key (explicit, no undefined-partition warning)
        # is a bounded single task, cheaper than a second fact scan
        w = Window.partitionBy(F.lit(0)).orderBy("period")
    vc = f"{agg}_{value_col}" if value_col is not None else None
    exploded = (
        dense.withColumn("_next", F.lead("period").over(w))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("period"),
                    # exclusive end: stop one step short of the next
                    # real bucket (exactly-adjacent buckets explode
                    # to just themselves); last row has no next
                    F.coalesce(
                        F.col("_next") - step_expr, F.col("period")
                    ),
                    step_expr,
                )
            ).alias("_p"),
            F.col("period").alias("_real"),
            "n_events",
            *([F.col(vc)] if vc else []),
        )
    )
    is_real = F.col("_p") == F.col("_real")
    out_cols = [
        *keys,
        F.col("_p").alias("period"),
        F.when(is_real, F.col("n_events"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
    ]
    if vc is not None:
        val = F.when(is_real, F.col(vc))
        if fill is not None:
            val = F.coalesce(val, F.lit(float(fill)))
        out_cols.append(val.alias(vc))
    return exploded.select(*out_cols)


def rolling_agg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_by: str | Sequence[str],
    window: str = "7 days",
    aggs: Sequence[str] = ("avg",),
    round_to: int | None = None,
) -> DataFrame:
    """Trailing time-window aggregates per row: e.g. the 7-day moving
    average ending at each event.

    One window per group ordered by event time with a
    ``rangeBetween(-interval, current)`` frame — a single shuffle on
    the group key.  Honest cost note: Spark's sliding-frame
    aggregation has no retract path, so whenever rows EXIT the frame
    the buffered frame is re-aggregated — per-task cost is
    O(rows × avg-frame-size), not O(rows); keep trailing windows
    modest relative to event density (the memory side IS bounded by
    the frame buffer).  Output adds ``{agg}_{value_col}_{window}``
    columns (window spelled with underscores).
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    if not keys:
        raise ValueError(
            "rolling_agg needs group_by: an ungrouped time window is "
            "a single global sort task"
        )
    span = _parse_duration(window, "window")
    # microsecond range key: whole-second truncation would make
    # same-second events frame PEERS, letting a row's "trailing"
    # window see values up to a second in its future
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_micros(df, ts_col))
        .rangeBetween(-span * 1_000_000, 0)
    )
    tag = window.replace(" ", "_")
    out = df
    # numeric columns keep their type (a decimal input sums exactly —
    # the oracle-stable form); only non-numeric goes through the
    # engine-wide numeric-on-demand cast
    from pyspark.sql.types import NumericType

    dtype = df.schema[value_col].dataType
    v = (
        F.col(value_col)
        if isinstance(dtype, NumericType)
        else F.col(value_col).try_cast("double")
    )
    for agg in aggs:
        if agg not in AGGS and agg != "count":
            raise ValueError(f"unknown agg {agg!r}")
        e = F.count(F.lit(1)).over(w) if agg == "count" else AGGS[agg](v).over(w)
        if round_to is not None and agg != "count":
            e = F.round(e, round_to)
        out = out.withColumn(f"{agg}_{value_col}_{tag}", e)
    return out


def sessionize(
    df: DataFrame,
    ts_col: str,
    group_by: str | Sequence[str],
    gap: str = "30 minutes",
    session_col: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Label each event with its gap-based session ordinal.

    A new session starts when the gap to the previous event of the
    same group exceeds ``gap``; ``session_col`` is the 1-based
    session ordinal within the group (deterministic — join it with
    the group key for a globally unique id).  Row-level counterpart
    of ``session_agg`` (streaming/windows.py), which aggregates
    whole sessions; this keeps every event row.  One shuffle on the
    group key; the running sum over the new-session flags is
    incremental per task.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    if not keys:
        raise ValueError("sessionize needs group_by")
    gap_us = _parse_duration(gap, "gap") * 1_000_000
    # tiebreak columns make the session ordinal deterministic when
    # two events of one group share a timestamp
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    # microsecond gap arithmetic: whole-second truncation would make
    # sub-second phase decide session boundaries (same fix class as
    # rolling_agg's range key)
    ts_long = ts_micros(df, ts_col)
    prev = F.lag(ts_long).over(w)
    new_sess = F.when(
        prev.isNull() | ((ts_long - prev) > gap_us), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def detect_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_by: str | Sequence[str],
    n_prev: int = 20,
    z: float = 3.0,
    min_prev: int = 5,
    order_by: Sequence[str] = (),
    round_to: int = 6,
) -> DataFrame:
    """Rolling z-score outlier flags: each value against the mean and
    sample stddev of its own trailing ``n_prev`` observations.

    The monitoring primitive for a continuously-ingesting pipeline —
    "this sensor/user/source just jumped".  The frame is the
    *preceding* rows only (never the current value — a spike must not
    be allowed to mask itself), per group, ordered by
    ``(ts_col, *order_by)``; pass an ``order_by`` tiebreak (e.g. an
    event id) whenever timestamps can collide, or the frame contents
    are partition-order-dependent.

    Adds ``prev_n`` (trailing observations seen), ``zscore`` (NULL
    during warm-up ``prev_n < min_prev`` or when the trailing
    variance is 0), and ``is_anomaly`` (``|zscore| > z``; never NULL
    — warm-up rows are ``false``).

    Cross-engine determinism: the rolling Σv and Σv² are *exact*
    decimal sums (decimal(18,6) values / decimal(38,12) squares — no
    float reassociation, so any window evaluation order gives the
    same total), cast to double only for the final mean/variance
    formula, which uses one fixed operation order a SQL oracle
    mirrors bit-for-bit.

    100 TB posture: one shuffle on the group key.  Honest cost note:
    Spark re-aggregates a bounded sliding frame whenever rows exit it
    (no retract path), so per-task cost is O(rows × n_prev) — with
    the typical n_prev of 10–50 that is a small constant, but it is
    not the O(rows) of an unbounded-preceding frame; state per task
    stays one frame buffer.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    if not keys:
        raise ValueError(
            "detect_anomalies needs group_by: an ungrouped rolling "
            "window is a single global sort task"
        )
    if n_prev < 2 or min_prev < 2:
        raise ValueError("n_prev and min_prev must be >= 2 "
                         "(sample variance needs 2 observations)")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in order_by])
        .rowsBetween(-n_prev, -1)
    )
    vd = F.col(value_col).cast("decimal(18,6)")
    sq = (vd * vd).cast("decimal(38,12)")
    # Materialize the THREE distinct window aggregates once (r14,
    # guide §2.4/§7.2 duplicated-subtree check): inlining them into
    # the derived mean/var/zscore/is_anomaly expressions made
    # Catalyst extract 26 window expressions over the same frame —
    # count/sum/sum stamped out up to 9× each — and WindowExec
    # re-aggregates EVERY one per row on a bounded sliding frame.
    # Same arithmetic, same fixed operation order, evaluated from the
    # materialized columns instead: bit-identical output, ~9× less
    # window-buffer work.
    clash = {"_an_n", "_an_s", "_an_ss"} & set(df.columns)
    if clash:
        raise ValueError(
            f"detect_anomalies reserves column names {sorted(clash)}"
        )
    base = df.select(
        *df.columns,
        F.count(vd).over(w).alias("_an_n"),
        F.sum(vd).over(w).cast("double").alias("_an_s"),
        F.sum(sq).over(w).cast("double").alias("_an_ss"),
    )
    n = F.col("_an_n")
    s = F.col("_an_s")
    ss = F.col("_an_ss")
    nd = n.cast("double")
    # fixed order (mirrored in SQL): var = max(ss - s*s/n, 0) / (n-1)
    var = F.greatest(ss - s * s / nd, F.lit(0.0)) / (nd - F.lit(1.0))
    zscore = F.when(
        (n >= min_prev) & (var > 0),
        F.round(
            (F.col(value_col).cast("double") - s / nd) / F.sqrt(var),
            round_to,
        ),
    )
    mid = base.select(
        *df.columns,
        n.alias("prev_n"),
        zscore.alias("zscore"),
    )
    return mid.select(
        *mid.columns,
        F.coalesce(
            F.abs(F.col("zscore")) > F.lit(float(z)), F.lit(False)
        ).alias("is_anomaly"),
    )


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    ts_col: str,
    group_by: str | Sequence[str] | None = None,
    allow_ungrouped: bool = False,
) -> DataFrame:
    """Forward-fill (LOCF): replace NULLs with the latest earlier
    non-NULL value within the group, in ``ts_col`` order.

    Ties on ``ts_col`` are broken by the existing row order being
    irrelevant: ``last(ignorenulls)`` over rows-unbounded-preceding
    takes whichever tied row the sort placed last — add a tiebreak
    column to ``ts_col`` upstream if ties are possible and matter.

    Without ``group_by`` the window is a single global sort task
    (same footgun class as keyless ``asof_join``) — opt in with
    ``allow_ungrouped=True`` for small/bounded frames only.
    """
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    if not keys and not allow_ungrouped:
        raise ValueError(
            "ffill without group_by is a single-partition global "
            "window; pass group_by= or opt in with "
            "allow_ungrouped=True on bounded data"
        )
    w = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
