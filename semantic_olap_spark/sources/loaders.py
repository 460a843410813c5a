"""Data loading: parquet star schema + JSON with flatten semantics.

The reference loads one denormalized JSON table and stringifies any
nested value at load time (Semantic-OLAP/main.py:5-22,
``flatten_main_records`` / ``stringify_nested``).  ``load_json_flat``
reproduces that contract declaratively: nested struct/array/map
columns become their JSON-text rendering via ``to_json`` — a pure
Catalyst expression, no Python in the loop.

``with_olap_id`` reproduces the reference's synthetic row id
(Semantic-OLAP/Agents/Components/OLAP_Memory.py:110-111 assigns
``range(len(df))``).  Distributed dense ids require a total order:

- ``order_by`` given  → dense 0..n-1 ids by that order via
  :func:`dense_ranks` — the parallel zipWithIndex construction
  (range-partition + broadcast prefix-sum offsets), NOT an
  unpartitioned window (deterministic, used by tests and anywhere
  parity matters);
- ``order_by=None``   → ``monotonically_increasing_id()`` (no
  shuffle, unique but sparse — fine whenever only identity is
  needed, which is every internal join in this engine).

The id is assigned ONCE per materialized node and carried through
derived views; operators never regenerate it (SURVEY.md §7.4 risk 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

OLAP_ID = "OLAP_ID"


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS).

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns surface as
    LongType nanos.  We detect them from the parquet footer (pyarrow)
    and convert to microsecond timestamps — same truncation DuckDB
    applies, keeping the oracle comparable.
    """
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


# Minimum on-disk footprint for the parallelism restore below to
# bother: below this the table is either a broadcast-sized dimension
# (nation/region/supplier/part at every SF — the repartition would
# just add a stage in front of every broadcast build) or a
# correctness-SF micro table where speed is irrelevant.  Env knob so
# a deployment can re-tune or disable (0 keeps every table eligible,
# a huge value disables the restore outright).
_SCAN_REBALANCE_MIN_BYTES = 512 * 1024
# Floor on rows per task after the restore: a task must carry enough
# rows to amortize its launch cost, so tables between the byte floor
# and ``cores × _MIN_ROWS_PER_TASK`` rows get proportionally fewer
# partitions instead of one near-empty task per core.
_MIN_ROWS_PER_TASK = 64

# (path, mtime) → (row_groups, bytes, rows, complete): footers are
# immutable per mtime, so repeated load_table calls (the bench loads
# tables per timed attempt) skip the re-read.  Metadata only — never
# data.  ``complete=False`` marks an early-exited sweep: ``groups``
# is then a lower bound that already met the caller's threshold.
# NB the key is the TOP-LEVEL path mtime: replacing a part file in a
# nested partition directory may not bump it, so a long-lived session
# could repartition from stale counts (perf-only — results never
# depend on this).  Fine for single-directory layouts like the bench
# testdata; a mutating multi-dir deployment should restart sessions
# or disable the rule via the byte-floor knob.
_LAYOUT_CACHE: dict[tuple[str, float], tuple[int, int, int, bool]] = {}


def _scan_layout(
    path: str, stop_groups: int | None = None
) -> tuple[int, int, int, bool] | None:
    """(row groups, bytes, rows, complete) of a parquet path.

    ``stop_groups`` bounds the driver-side footer sweep: the loop
    early-exits as soon as the running row-group count reaches it —
    a well-laid-out table (thousands of files at 100 TB) answers
    "enough groups, rule is a no-op" after reading at most
    ``stop_groups`` footers instead of every one.  An early exit
    returns ``complete=False`` with counts that are lower bounds.
    """
    import os

    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        return None
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        # a truncated sweep is only reusable if it already answers
        # the current threshold; else fall through and rescan
        if hit[3] or (stop_groups is not None and hit[0] >= stop_groups):
            return hit
    try:
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq

        groups = bytes_ = rows = 0
        complete = True
        for f in ds.dataset(path, format="parquet").files:
            meta = pq.ParquetFile(f).metadata
            groups += meta.num_row_groups
            rows += meta.num_rows
            bytes_ += os.path.getsize(f)
            if stop_groups is not None and groups >= stop_groups:
                complete = False
                break
    except Exception:
        return None
    _LAYOUT_CACHE[key] = (groups, bytes_, rows, complete)
    return _LAYOUT_CACHE[key]


def restore_scan_parallelism(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Round-robin repartition a scan whose file layout under-splits.

    Parquet's unit of scan parallelism is the row group: a table
    written as few files with one row group each runs every scan —
    and all map-side work above it (filter, projection, partial
    aggregation, Arrow UDF batches) — on that many tasks, no matter
    what ``spark.sql.files.maxPartitionBytes`` says.  The local
    testdata is exactly this shape (one single-row-group file per
    table), so without this every per-row expression in the engine
    executes on ONE core of the machine.

    The rule is derived from the source layout, not tuned to any
    machine: it fires only when the layout yields fewer row groups
    than ``defaultParallelism`` (a production table at 100 TB has
    thousands of row groups — permanent no-op) and the table is big
    enough to matter (``_SCAN_REBALANCE_MIN_BYTES``).  A table that
    trips the rule is by construction small or pathologically
    unsplittable, the one case where the guide's "repartition
    immediately after the read" is the right call; filters and
    column pruning still reach the scan (Catalyst pushes both
    through a Repartition node).

    OPT-IN per call site (``load_table(..., rebalance=True)``), not
    blanket: the interleaved A/B at sf0.1 (OPTIMIZATION_r13.md)
    shows the repartition pays off only where per-row compute
    dominates (text/cleaning expression chains, decimal-heavy
    aggregation, span fingerprinting — 0.4-0.8×) and *costs* time
    where per-row work is cheap or the query's first real operation
    is itself a shuffle on a proper key (pure filters, windows,
    fact-fact joins, pair joins whose task count multiplies — up to
    3×).  A filter pushed below the Repartition still evaluates on
    the scan split (pushdown is preserved), so filter-shaped
    operators gain nothing by construction.

    Results are unaffected: every operator in the package is
    partition-count invariant by design (decimal/integer aggregation,
    per-row expressions, key-partitioned windows), which the replay
    contract re-verifies — see OPTIMIZATION_r13.md for the forced
    all-tables replay evidence.
    """
    import os

    try:
        min_bytes = int(
            os.environ.get(
                "SPARK_GRAFT_SCAN_REBALANCE_MIN_BYTES",
                _SCAN_REBALANCE_MIN_BYTES,
            )
        )
    except ValueError:
        # malformed knob (e.g. '512k', '') must not break every
        # rebalance-enabled load — fall back to the built-in floor
        min_bytes = _SCAN_REBALANCE_MIN_BYTES
    par = spark.sparkContext.defaultParallelism
    layout = _scan_layout(path, stop_groups=par)
    if layout is None:
        return df
    groups, bytes_, rows, complete = layout
    if groups >= par or not complete or bytes_ < min_bytes:
        return df
    target = min(par, max(1, rows // _MIN_ROWS_PER_TASK))
    if target <= groups:
        return df
    return df.repartition(target)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    rebalance: bool = False,
) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        # the vectorized reader rejects TIMESTAMP(NANOS) unless this
        # legacy flag is on; set it here so tables load correctly in
        # ANY session, not just ones built by our get_spark factory
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if rebalance:
        df = restore_scan_parallelism(spark, df, path)
    # Timestamp normalization (r7 — supersedes r6's NTZ→TimestampType
    # cast): tz-naive encodings normalize to TIMESTAMP_NTZ, never to
    # the session TimestampType.  A naive wall-clock has no instant;
    # interpreting it in the session zone is lossy exactly where it
    # matters — across a DST transition of a non-UTC zone, the
    # spring-forward gap wall-clocks (e.g. 2024-03-10 02:30 under
    # America/Los_Angeles) shift by an hour and epoch deltas come out
    # ±1h vs any naive-SQL engine (DuckDB, the driver oracle).  NTZ
    # end-to-end makes every downstream consumer — ordering, range
    # windows via ts_micros (functions/timeseries.py), as-of interval
    # arithmetic, collection/stringification — a pure function of the
    # stored wall-clock, invariant to the session timezone.  Proven
    # by tests/test_dst_timestamps.py on a transition-spanning table.
    for c in nanos_cols:
        # the LongType check is load-bearing: pyarrow also reports
        # Spark-written INT96 timestamps as timestamp[ns], but Spark
        # reads those as proper TimestampType (real instants — left
        # alone) — only a column that actually surfaced as raw long
        # nanos needs decoding.  `div` = integer division (epoch-
        # nanos exceed double precision); timestampadd from an NTZ
        # epoch anchor builds the NTZ wall-clock without ever
        # consulting the session zone (timestamp_micros() would
        # produce a session-rendered instant instead).
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(
                c,
                F.expr(
                    f"timestampadd(MICROSECOND, `{c}` div 1000, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table and register temp views of each."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def _is_nested(dt: T.DataType) -> bool:
    return isinstance(dt, (T.StructType, T.ArrayType, T.MapType))


def load_json_flat(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Read a JSON array of records; stringify nested values.

    Mirrors Semantic-OLAP/main.py:5-16: dict/list values become their
    ``json.dumps`` text so the table is flat.  Here that is
    ``to_json`` on struct/array/map columns — stays JVM-side.
    """
    df = spark.read.option("multiLine", str(multiline).lower()).json(path)
    cols = []
    for f in df.schema.fields:
        if _is_nested(f.dataType):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    malformed: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read CSV with an explicit malformed-record policy.

    ``schema`` should be given in production — schema inference is a
    full extra pass over the data (at 100 TB, a full extra scan).
    ``malformed``: PERMISSIVE (bad fields → null, row kept),
    DROPMALFORMED (row dropped), or FAILFAST (abort).  With
    ``corrupt_col`` the PERMISSIVE mode lands the raw bad line in
    that column so a quality gate can route rejects instead of
    silently nulling them.
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", malformed)
    )
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        if schema is None:
            # Spark only captures corrupt records into a field of a
            # USER-SUPPLIED schema; with inference the option is
            # silently ignored and bad rows become plain nulls
            raise ValueError(
                "corrupt_col requires an explicit schema= (Spark "
                "cannot capture corrupt records under schema "
                "inference)"
            )
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        # fresh StructType: .add mutates in place, and silently
        # growing the CALLER's schema breaks its later use (a
        # DROPMALFORMED read with a phantom column drops all rows)
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(corrupt_col, T.StringType())]
        )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    malformed: str = "PERMISSIVE",
    flatten: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON (the corpus-interchange format).

    Unlike :func:`load_json_flat` (one multiline JSON array — the
    reference's input shape), JSONL is splittable: every executor
    reads its own byte range, so a 100 TB corpus parallelizes at the
    block level.  ``flatten=True`` applies the same stringify-nested
    contract on top.
    """
    reader = spark.read.option("mode", malformed)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if flatten:
        df = df.select(
            *[
                F.to_json(F.col(f.name)).alias(f.name)
                if _is_nested(f.dataType)
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    return df


def flatten_json_col(
    df: DataFrame,
    col: str,
    prefix: str | None = None,
    schema: T.StructType | str | None = None,
    drop: bool = False,
) -> DataFrame:
    """Expand a JSON-string column into typed columns.

    The inverse of :func:`load_json_flat`'s stringify: event tables
    routinely carry a JSON ``props`` payload; this parses it with
    ``from_json`` and surfaces each top-level field as
    ``{prefix}{field}`` (default prefix ``{col}_``).  With
    ``schema=None`` the schema is inferred from ONE sampled non-null
    value (a bounded driver lookup — pass an explicit schema in
    production so inference never misses fields absent from the
    sampled row; at 100 TB an explicit schema is also what makes the
    parse a pure scan-side expression with no setup cost).
    ``drop=True`` removes the original JSON column.
    """
    prefix = f"{col}_" if prefix is None else prefix
    if schema is None:
        sample = (
            df.select(col).filter(F.col(col).isNotNull()).limit(1).collect()
        )
        if not sample:
            raise ValueError(
                f"cannot infer schema: column {col!r} has no non-null "
                f"values; pass schema= explicitly"
            )
        inferred = df.sparkSession.range(1).select(
            F.schema_of_json(F.lit(sample[0][0])).alias("s")
        ).collect()[0]["s"]
        schema = inferred
    parsed = df.withColumn("_parsed", F.from_json(F.col(col), schema))
    parsed_type = parsed.schema["_parsed"].dataType
    if not isinstance(parsed_type, T.StructType):
        raise ValueError(
            f"flatten_json_col needs JSON objects; column {col!r} "
            f"parses as {parsed_type.simpleString()} — arrays/scalars "
            f"have no fields to flatten"
        )
    field_names = parsed_type.fieldNames()
    out = parsed.select(
        "*",
        *[
            F.col(f"_parsed.{f}").alias(f"{prefix}{f}")
            for f in field_names
        ],
    ).drop("_parsed")
    return out.drop(col) if drop else out


def load_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read ORC (the Hive/Trino-estate columnar format).

    Spark's native vectorized ORC reader has the same pushdown
    surface as parquet — predicate pushdown to stripe/row-group
    stats, column pruning, hive partition pruning — so downstream
    plans are format-agnostic.  ``schema`` skips footer inference on
    huge file listings; ``merge_schema=True`` reconciles files whose
    schemas drifted (an extra listing pass — leave off for stable
    layouts).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.orc(path)


def load_text(
    spark: SparkSession,
    path: str,
    whole_files: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Read raw text: one row per line, or one row per file.

    The corpus-ingest primitive for plain-text sources.  Line mode
    (default) is splittable — executors read byte ranges, so a huge
    file parallelizes; ``line_sep`` overrides the record delimiter
    (e.g. ``"\\0"`` for null-delimited dumps).  ``whole_files=True``
    yields ``(path, text)`` per file via ``wholetext`` — one TASK per
    file and the whole file in one row's memory, so reserve it for
    many-small-files layouts (the file listing itself parallelizes;
    the per-file read does not split).
    """
    reader = spark.read
    if whole_files:
        # NB: the option spelling is "wholetext" but only the text()
        # keyword argument reliably applies it
        df = reader.text(path, wholetext=True)
        return df.select(
            F.input_file_name().alias("path"),
            F.col("value").alias("text"),
        )
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path).select(F.col("value").alias("text"))


def dense_ranks_with_total(
    df: DataFrame, order_by: list[str], rank_col: str
) -> tuple[DataFrame, int]:
    """Dense 0..n-1 ranks by ``order_by`` without a global window.

    The ``zipWithIndex`` construction (same technique as
    ``sem_topk``'s tournament ranks): range-partition by the order
    columns so partition p's keys all sort below partition p+1's,
    count rows per partition (one small job), then global rank =
    per-partition ``row_number`` + the broadcast prefix-sum offset of
    the partition.  Every stage is parallel — no single-partition
    exchange — so this survives a 1000-executor total order where
    ``Window.orderBy`` (unpartitioned) would funnel the table through
    one task.

    The ranged frame is pinned with ``localCheckpoint`` (eager, cuts
    lineage) — NOT a plain ``persist``: ``repartitionByRange``
    samples boundaries with a per-execution seed, so if cached
    blocks were lost and the frame recomputed, rows could land in
    different partitions while the collected offsets still described
    the old layout, silently corrupting ids.  A checkpoint makes
    that impossible — lost blocks fail the job instead of
    recomputing differently (correct-or-error, never wrong).
    """
    cols = [F.col(c) for c in order_by]
    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(nparts, *cols)
        .withColumn("_dr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    part_counts = sorted(
        (r["_dr_pid"], r["cnt"])
        for r in ranged.groupBy("_dr_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in part_counts:
        offsets[pid] = acc
        acc += cnt
    # empty input: F.create_map() with no args is map<void,void> and
    # map()[int] fails analysis — use a zero offset (no rows anyway)
    offset_expr = (
        F.create_map(
            *[F.lit(x) for pair in offsets.items() for x in pair]
        )[F.col("_dr_pid")]
        if offsets
        else F.lit(0)
    )
    local_w = Window.partitionBy("_dr_pid").orderBy(*cols)
    out = ranged.withColumn(
        rank_col,
        (F.row_number().over(local_w) - F.lit(1) + offset_expr).cast("long"),
    ).drop("_dr_pid")
    return out, acc


def running_totals(
    df: DataFrame,
    order,
    value_col: str,
    out_col: str,
    inclusive: bool = True,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order`` — parallel.

    The value-summing sibling of :func:`dense_ranks_with_total`:
    range-partition by the order expressions, sum per partition (one
    bounded collect), broadcast the prefix offsets, add a
    partition-local window sum.  No single-partition exchange, and
    the ranged frame is pinned with ``localCheckpoint`` for the same
    correct-or-error reason (re-sampled range boundaries under stale
    offsets would silently corrupt the running totals).  NULL values
    contribute nothing to the sum (callers wanting NULL→0 coalesce
    first).  ``value_col`` must be an integral type: the construction
    is EXACT only for integers (the int offsets and long output would
    silently truncate fractional sums).  Shared by ``pack_documents``
    and ``take_token_budget``.
    """
    vtype = df.schema[value_col].dataType
    if not isinstance(
        vtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise TypeError(
            f"running_totals needs an integral value_col; "
            f"{value_col!r} is {vtype.simpleString()} — cast to long "
            f"(or scale to fixed-point) first"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(nparts, *cols)
        .withColumn("_rt_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    part_totals = sorted(
        (r["_rt_pid"], int(r["tot"]))
        for r in ranged.groupBy("_rt_pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("tot"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, tot in part_totals:
        offsets[pid] = acc
        acc += tot
    offset_expr = (
        F.create_map(
            *[F.lit(x) for pair in offsets.items() for x in pair]
        )[F.col("_rt_pid")]
        if offsets
        else F.lit(0)
    )
    local_w = (
        Window.partitionBy("_rt_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(value_col)).over(local_w) + offset_expr
    if not inclusive:
        run = run - F.coalesce(F.col(value_col), F.lit(0))
    return ranged.withColumn(out_col, run.cast("long")).drop("_rt_pid")


def dense_ranks(
    df: DataFrame, order_by: list[str], rank_col: str
) -> DataFrame:
    """:func:`dense_ranks_with_total` without the row count."""
    return dense_ranks_with_total(df, order_by, rank_col)[0]


def with_olap_id(df: DataFrame, order_by: list[str] | None = None) -> DataFrame:
    """Attach the synthetic row id (reference: OLAP_Memory.py:110-111).

    With ``order_by``: dense 0..n-1 ids by that order via
    :func:`dense_ranks` — deterministic (parity with the oracle's
    ``row_number() over (order by ...) - 1``) yet fully parallel; no
    unpartitioned window.  Without: sparse unique ids via
    ``monotonically_increasing_id`` (scale path, no shuffle, no job).
    """
    if OLAP_ID in df.columns:
        return df
    if order_by:
        return dense_ranks(df, order_by, OLAP_ID)
    return df.withColumn(OLAP_ID, F.monotonically_increasing_id())
