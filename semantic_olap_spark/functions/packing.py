"""Sequence packing: assign documents to fixed token-budget bins.

The pretraining-pipeline "concat-and-chunk" step: lay documents out
back-to-back in a deterministic order and cut the stream into
``budget``-token bins.  Each document gets the bin containing its
first token plus its offset inside that bin — exactly what a
downstream tokenizer/packer needs to materialize training sequences,
computed without ever materializing the concatenation.

The core is an EXACT distributed prefix sum over a global order —
the textbook single-partition-window trap (SURVEY.md scale rule: no
global ``Window.orderBy``).  Here it is the same two-phase
construction ``sem_topk`` uses for global ranks
(operators/semantic.py:560-597): range-partition by the order key
and persist (pinning one partition layout — range boundaries are
sampled per execution), collect ONE bounded row per partition (its
token total), prefix-sum those driver-side, then add each row's
partition offset to its partition-local running sum (window
partitioned by partition id — bounded state, full parallelism).

Determinism: output is a pure function of ``(data, order_col,
budget)`` — no sampling, no partition-count dependence — so the
driver contract verifies it against a DuckDB window-function oracle
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_documents"]


def pack_documents(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    out_prefix: str = "",
) -> DataFrame:
    """Assign each document a ``bin`` and in-bin ``offset``.

    ``token_col``: an existing integer token-count column; if None,
    counts whitespace tokens of ``text_col`` scan-side
    (:func:`~semantic_olap_spark.functions.text.token_count`).
    Documents are laid out in ``order_col`` order; ``bin`` = the
    ``budget``-token chunk containing the document's first token,
    ``offset`` = position within that chunk.  A document longer than
    the remaining space simply spans chunks (the downstream chunker
    splits it); use a length filter upstream if truncation is not
    acceptable.

    Output: input columns + ``{out_prefix}n_tokens / bin / offset``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if token_col is None:
        from semantic_olap_spark.functions.text import token_count

        toks: Column = token_count(F.col(text_col))
    else:
        toks = F.col(token_col).cast("long")
    n_tok = f"{out_prefix}n_tokens"
    with_tok = df.withColumn(n_tok, toks)

    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        with_tok.repartitionByRange(nparts, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # one bounded row per partition: (pid, token total)
    part_totals = sorted(
        (r["_pid"], r["tot"])
        for r in ranged.groupBy("_pid")
        .agg(F.coalesce(F.sum(n_tok), F.lit(0)).alias("tot"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, tot in part_totals:
        offsets[pid] = acc
        acc += int(tot)
    off_map = F.create_map(*[F.lit(x) for pair in offsets.items() for x in pair])

    local_w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (
        F.sum(F.col(n_tok)).over(local_w)
        - F.col(n_tok)
        + off_map[F.col("_pid")]
    )
    b = int(budget)
    out = (
        ranged.withColumn("_start", start.cast("long"))
        # `div` = integer division: token offsets are exact longs;
        # float division would wobble past 2^53 total tokens
        .withColumn(f"{out_prefix}bin", F.expr(f"_start div {b}"))
        .withColumn(f"{out_prefix}offset", F.col("_start") % F.lit(b))
        .drop("_pid", "_start")
    )
    return out
