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
construction ``sem_topk`` uses for global ranks, shared as
``sources.loaders.running_totals``: range-partition by the order
key and pin the layout with ``localCheckpoint`` (range boundaries
are sampled per execution — recompute under stale offsets must be
impossible), collect ONE bounded row per partition (its token
total), prefix-sum those driver-side, then add each row's partition
offset to its partition-local running sum (window partitioned by
partition id — bounded state, full parallelism).

Determinism: output is a pure function of ``(data, order_col,
budget)`` — no sampling, no partition-count dependence — so the
driver contract verifies it against a DuckDB window-function oracle
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["assemble_docs", "chunk_documents", "pack_documents"]


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    chunk_id_col: str = "chunk_id",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Split each document into overlapping ``size``-token windows.

    The retrieval/context-window chunker: whitespace tokens, windows
    of ``size`` tokens starting every ``size - overlap`` tokens, the
    last window clamped to the document end.  A document of ``n``
    tokens yields ``1`` chunk when ``n <= size``, else
    ``⌈(n - size) / stride⌉ + 1`` — every token is covered and no
    window starts past the last full stride (no redundant tail chunk
    fully contained in its predecessor).  Blank/NULL text yields zero
    chunks.

    Output: input columns + ``{chunk_id_col}`` (0-based),
    ``{chunk_col}`` (space-joined window), ``n_chunk_tokens``.

    Scale: one scan-side ``transform``+``explode`` — one lambda
    invocation per *chunk* (each a single ``slice``), not per token
    (SCALE.md "Global posture" interpreted-lambda rule), no shuffle,
    output ~``n/stride`` rows per document.  Deterministic, so the
    driver verifies it against a DuckDB ``generate_series`` +
    ``list_slice`` oracle bit-for-bit.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size, got {overlap}"
        )
    clash = {chunk_id_col, chunk_col, "n_chunk_tokens", "_chunks"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"chunk_documents output columns {sorted(clash)} already "
            f"exist on the input — rename or drop them first"
        )
    stride = size - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    n_chunks = F.when(
        n <= size, F.lit(1)
    ).otherwise(F.floor((n - size + stride - 1) / F.lit(stride)) + 1)
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, size), " "),
    )
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .withColumn("_chunks", chunks)
        .select(
            "*", F.posexplode("_chunks").alias(chunk_id_col, chunk_col)
        )
        .drop("_chunks")
        .withColumn(
            "n_chunk_tokens",
            F.least(
                F.lit(size), n - F.col(chunk_id_col) * stride
            ).cast("int"),
        )
    )


def assemble_docs(
    df: DataFrame,
    group_col: str,
    order_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    out_col: str = "text",
) -> DataFrame:
    """Reassemble fragments into one document per group.

    The inverse of :func:`chunk_documents` at corpus scale: crawl
    pipelines carry page/paragraph fragments keyed by a parent id
    (WARC record, thread id, book id) that must be stitched back into
    one training document in a deterministic order.  One ``groupBy``
    — ``collect_list(struct(order, text))`` then a JVM-side
    ``array_sort`` + ``transform`` + ``array_join``, so ordering
    never needs a sort shuffle, only the group-by shuffle it already
    pays.  Output: ``(group_col, {out_col}, n_fragments)``.

    Group size bounds memory: one group's fragments must fit in an
    executor's aggregation buffer (same contract as sem_reduce's
    value cap) — cap fragment counts upstream for degenerate parents.
    """
    frag = F.struct(
        F.col(order_col).alias("o"), F.col(text_col).alias("t")
    )
    return (
        df.groupBy(group_col)
        .agg(F.collect_list(frag).alias("_f"))
        .select(
            group_col,
            F.array_join(
                F.transform(F.array_sort("_f"), lambda s: s["t"]),
                sep,
            ).alias(out_col),
            F.size("_f").alias("n_fragments"),
        )
    )


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

    from semantic_olap_spark.sources.loaders import running_totals

    b = int(budget)
    return (
        running_totals(
            with_tok, [order_col], n_tok, "_start", inclusive=False
        )
        # `div` = integer division: token offsets are exact longs;
        # float division would wobble past 2^53 total tokens
        .withColumn(f"{out_prefix}bin", F.expr(f"_start div {b}"))
        .withColumn(f"{out_prefix}offset", F.col("_start") % F.lit(b))
        .drop("_start")
    )
