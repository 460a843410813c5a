"""Similarity search over embedding columns (``array<float>``).

Beyond-reference operators (SURVEY.md §7.1 M7; BASELINE.json north
star).  Three query paths over a corpus of embedding vectors:

- ``cosine_topk``  — brute-force cosine top-k against one query
                     vector.  Pure Catalyst (``zip_with`` +
                     ``aggregate``), physical plan is a scan +
                     TakeOrderedAndProject: each partition keeps a
                     size-k heap, only k rows per partition reach the
                     driver merge.  The exact baseline.
- ``lsh_topk``     — random-hyperplane LSH: bucket the corpus by
                     sign-bit signature, probe the query's bucket
                     (multi-probe to Hamming ≤ 1), exact-rank the
                     candidates.  Approximate, prunes the scan.
- ``ivf_topk``     — IVF: k-means coarse centroids (driver-side
                     numpy over a bounded sample), assign vectors to
                     nearest centroid, probe the ``nprobe`` centroids
                     closest to the query, exact-rank within.  At
                     scale the assignment column is the partition/
                     bucket key, so probing prunes entire partitions.

Plus ``cosine_pairs`` — all-pairs cosine ≥ threshold within an
optional blocking column (embedding-based near-dup detection).

All exact math is done in double precision after ``cast('array<
double>')`` so results are reproducible against the DuckDB oracle
(``list_cosine_similarity`` on ``DOUBLE[]``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

__all__ = [
    "cosine_pairs",
    "cosine_topk",
    "dequantize_embeddings",
    "ivf_assign",
    "ivf_topk",
    "lsh_assign",
    "lsh_topk",
    "quantize_embeddings",
    "quantize_index",
    "quantized_topk",
    "train_ivf_centroids",
    "write_ann_index",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _as_double(vec_col: str) -> Column:
    return F.col(vec_col).cast("array<double>")


def _lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric int8 quantization: 4× smaller vectors for ANN tiers.

    Per-vector max-abs scaling: ``scale = max|x| / 127``, ``q_i =
    floor(x_i / scale + 0.5)`` in [-127, 127] — written as an
    explicit ``floor(+0.5)`` (not ``round``) so both engines share
    one rounding rule and the oracle is bit-exact.  An all-zero (or
    NULL-scale) vector quantizes to zeros with scale 0.

    At 100 TB the embedding column dominates storage and shuffle
    width; an int8 tier cuts both 4× while keeping recall@k within
    ~1% for max-abs-normalized corpora — the standard coarse tier in
    front of a float re-rank (:func:`dequantize_embeddings`).  Pure
    scan-side array exprs; the scale is materialized once per row,
    not re-derived per element.
    """
    x = _as_double(vec_col)
    with_scale = df.withColumn(
        scale_col,
        F.aggregate(
            x, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
        )
        / F.lit(127.0),
    )
    q = F.when(
        F.col(scale_col) > 0,
        F.transform(
            x,
            lambda v: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(v / F.col(scale_col) + F.lit(0.5)).cast("int"),
                ),
            ),
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0)))
    return with_scale.withColumn(qvec_col, q)


def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct float vectors from the int8 tier: ``q_i · scale``."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col),
            lambda v: v.cast("double") * F.col(scale_col),
        ),
    )


def quantize_index(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the int8 coarse tier once: unit-quantized codes + scale.

    Adds ``_qs`` (per-row scale) and ``_qv`` (int8 codes of the
    *unit* vector) to ``df``.  Persist or write this frame (e.g. via
    ``write_partitioned``) and pass it to :func:`quantized_topk` as
    ``index_df`` — repeated queries then skip the whole
    normalize+quantize pass, the same assign-once/probe-many
    contract as :func:`ivf_assign`/:func:`lsh_assign`.
    """
    x = _as_double(vec_col)
    # norm as its own column first: embedding _norm(x) inside the
    # per-element lambda would re-evaluate the O(d) fold d times.
    # Zero-norm rows (hash_embed of blank text) map to the all-zero
    # unit vector — ANSI mode would otherwise abort on the division.
    base = df.withColumn("_n", _norm(x)).withColumn(
        "_u",
        F.when(
            F.col("_n") > 0, F.transform(x, lambda v: v / F.col("_n"))
        ).otherwise(F.transform(x, lambda v: F.lit(0.0))),
    )
    # the quantize step is quantize_embeddings applied to the unit
    # vector — one definition of the max-abs scale + floor(+0.5)
    # clamp rule (its scale-0 guard covers the zero vector)
    return quantize_embeddings(
        base, vec_col="_u", qvec_col="_qv", scale_col="_qs"
    ).drop("_n", "_u")


def quantized_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Two-tier cosine top-k: int8 coarse scan, float re-rank.

    Tier 1 quantizes the *unit* vectors (so inner product ≈ cosine)
    and scores every row with an exact int64 dot product of int8
    codes — at 100 TB this is the tier that touches the whole
    corpus, at 4× less scan width and integer arithmetic.  Tier 2
    re-scores only the coarse top ``k·rerank`` rows with the exact
    float cosine and returns the top ``k``.  Output ``(id, cosine)``
    — identical shape to :func:`cosine_topk`; recall depends only on
    the coarse tier not dropping a true top-k row out of the top
    ``k·rerank`` (int8 on unit vectors keeps relative error ~1/254,
    so ``rerank=4`` is generous).

    Every arithmetic step (sequential fold sums, ``floor(+0.5)``
    quantization, int dot) is order-pinned, so the full two-tier
    pipeline reproduces bit-exactly in the SQL oracle.  The query is
    quantized with the same rule driver-side.

    ``index_df``: a pre-built (ideally persisted) frame from
    :func:`quantize_index` — repeated queries then read codes
    instead of re-quantizing the corpus per call.
    """
    if k <= 0 or rerank < 1:
        raise ValueError(f"need k > 0, rerank >= 1; got {k}, {rerank}")
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qnorm = float(np.sqrt(np.sum(q * q)))
    if not qnorm > 0:
        raise ValueError("query_vec must have a positive norm")
    qn = q / qnorm
    qs = float(np.max(np.abs(qn)) / 127.0)
    qq = [int(v) for v in np.floor(qn / qs + 0.5).clip(-127, 127)]

    if index_df is not None:
        missing = {"_qs", "_qv"} - set(index_df.columns)
        if missing:
            raise ValueError(
                f"index_df lacks {sorted(missing)}; build it with "
                f"quantize_index()"
            )
        base = index_df
    else:
        base = quantize_index(df, vec_col=vec_col)
    qlit = F.array(*[F.lit(v) for v in qq])
    idot = F.aggregate(
        F.zip_with(
            F.col("_qv"), qlit, lambda a, b: (a * b).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    coarse = (
        base.withColumn("_coarse", idot.cast("double") * F.col("_qs"))
        .orderBy(F.col("_coarse").desc(), F.col(id_col).asc())
        .limit(int(k) * int(rerank))
    )
    exact = F.round(cosine_similarity(vec_col, [float(v) for v in q]), round_to)
    return (
        coarse.select(F.col(id_col), exact.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def cosine_similarity(vec_col: str, query_vec: Sequence[float]) -> Column:
    """Cosine similarity of a vector column against a constant query."""
    q = [float(x) for x in query_vec]
    qn = float(np.linalg.norm(q))
    a = _as_double(vec_col)
    denom = _norm(a) * F.lit(qn)
    return F.when(denom > 0, _dot(a, _lit_vec(q)) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k: ``(id, cosine)``, ordered desc, id tiebreak.

    Ordering uses the *rounded* score so ranking is stable across
    engines' float summation order; ``round_to=6`` absorbs double
    noise while keeping real score differences.
    """
    score = F.round(cosine_similarity(vec_col, query_vec), round_to)
    return (
        df.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    round_to: int = 6,
    broadcast: bool = True,
    allow_unblocked: bool = False,
    strategy: str = "matmul",
    max_broadcast_mb: int = 256,
) -> DataFrame:
    """Pairs with cosine ≥ threshold — embedding near-dup detection.

    Pre-normalizes each vector once so the pair step is a plain dot
    product.  All-pairs within ``block_col`` (or the whole table when
    None — brute-force baseline; at scale, block on an LSH/IVF
    assignment column).  Output ``(id_a, id_b, cosine)``, id_a < id_b.
    The unblocked O(n²) mode must be requested explicitly with
    ``allow_unblocked=True`` — an accidental all-pairs join over a
    full embedding corpus is a cluster-killer.

    Two physical strategies, identical output (equivalence pinned in
    ``tests/test_similarity.py``):

    - ``"matmul"`` (default) — Arrow-batched BLAS block nested-loop:
      the corpus (ids + normalized float64 matrix) is collected and
      broadcast once — the SAME data movement as the expr path's
      broadcast-hash side — and each left partition computes chunked
      ``L @ R.T`` in numpy, emitting only candidate pairs above a
      conservative raw-score margin.  The exact round/threshold step
      stays in Spark (``F.round`` is decimal-exact HALF_UP via
      BigDecimal of the shortest-repr double; ``np.round`` is
      scaled-rint half-even — they disagree on values like 2.675, so
      numpy only PRE-filters with a half-ulp-of-round_to slack and
      Catalyst makes the final call, keeping the boundary arithmetic
      bit-identical to the expr path).  ~50-100× less per-pair cost
      than interpreted ``zip_with``/``aggregate`` lambdas.
    - ``"expr"`` — pure-Catalyst broadcast NLJ with per-pair
      higher-order-function dot products.  The oracle-twin reference
      path; also the fallback wherever Arrow/pandas is unavailable.

    Both strategies broadcast the full right side, so both share the
    same scale bound: the corpus matrix must fit per-executor
    (``max_broadcast_mb`` guard on the matmul path).  Beyond that,
    block on an LSH/IVF column and bound block sizes — at 100 TB the
    blocked form's broadcast side is the per-block slice dictionary,
    still corpus-sized here but partition-prunable once the index is
    persisted via :func:`write_ann_index`.

    ``broadcast=True`` (expr path): broadcast-right + repartitioned-
    left join — a blocked self-join otherwise caps parallelism at
    #blocks tasks (see
    :func:`~semantic_olap_spark.functions.dedup.jaccard_pairs`).
    ``broadcast=False`` forces the expr shuffle-join path even under
    the matmul default — matmul inherently collects+broadcasts the
    corpus, so a caller opting out of right-side movement gets the
    plan that actually honors it (behavior change vs r6, where expr
    was the only strategy).
    """
    if block_col is None and not allow_unblocked:
        raise ValueError(
            "cosine_pairs without block_col is an O(n²) all-pairs "
            "self-join; block on an lsh_assign/ivf_assign column at "
            "scale, or opt in with allow_unblocked=True"
        )
    if strategy not in ("matmul", "expr"):
        raise ValueError(f"unknown cosine_pairs strategy {strategy!r}")
    if strategy == "matmul" and not broadcast:
        # broadcast=False is an explicit "do not move the right side
        # to one place" request that predates the matmul default —
        # matmul ALWAYS collects+broadcasts the corpus, so honoring
        # the flag means taking the expr shuffle-join path (where
        # broadcast=False suppresses the broadcast hint below).
        strategy = "expr"
    if strategy == "matmul":
        return _cosine_pairs_matmul(
            df, threshold, id_col, vec_col, block_col, round_to,
            max_broadcast_mb,
        )
    a = _as_double(vec_col)
    # materialize the norm once per row: embedding the O(d) norm
    # aggregate inside the per-element lambda would re-evaluate it d
    # times (O(d²) per row)
    base = (
        df.select(
            F.col(id_col),
            *([F.col(block_col)] if block_col else []),
            a.alias("_a"),
        )
        .withColumn("_n", _norm(F.col("_a")))
        .select(
            F.col(id_col),
            *([F.col(block_col)] if block_col else []),
            F.when(
                F.col("_n") > 0,
                F.transform(F.col("_a"), lambda x: x / F.col("_n")),
            )
            .otherwise(F.transform(F.col("_a"), lambda x: F.lit(0.0)))
            .alias("_u"),
        )
    )
    left = base.select(
        F.col(id_col).alias("id_a"),
        *([F.col(block_col).alias("_blk_a")] if block_col else []),
        F.col("_u").alias("_ua"),
    )
    right = base.select(
        F.col(id_col).alias("id_b"),
        *([F.col(block_col).alias("_blk_b")] if block_col else []),
        F.col("_u").alias("_ub"),
    )
    cond = F.col("id_a") < F.col("id_b")
    if block_col:
        cond = cond & (F.col("_blk_a") == F.col("_blk_b"))
    cos = F.round(_dot(F.col("_ua"), F.col("_ub")), round_to)
    if broadcast:
        nparts = df.sparkSession.sparkContext.defaultParallelism * 2
        left = left.repartition(nparts)
        right = F.broadcast(right)
    return (
        left.join(right, cond)
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _cosine_pairs_matmul(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    block_col: str | None,
    round_to: int,
    max_broadcast_mb: int,
) -> DataFrame:
    """BLAS block nested-loop behind :func:`cosine_pairs`.

    Left side stays distributed (mapInPandas over the input's
    partitions); the right side is one driver collect + broadcast of
    ``(ids, blocks, normalized matrix)`` — the same movement a
    broadcast-hash join performs.  Per Arrow batch, left rows are
    normalized and matmul'd against the broadcast matrix in chunks
    sized to ~4M score cells so peak memory is flat regardless of
    corpus size.  Blocked mode slices the broadcast matrix per block
    (dict of contiguous ranges after a block argsort) so cross-block
    pairs cost nothing, mirroring the expr path's join condition.

    Emits RAW float64 scores filtered at ``threshold - 10^-round_to``
    (superset of every pair whose HALF_UP-rounded score can reach the
    threshold); the decimal-exact round + final filter happen in
    Catalyst so boundary behavior is bit-identical to the expr path.
    """
    spark = df.sparkSession
    id_field = df.schema[id_col]
    sel = [F.col(id_col), _as_double(vec_col).alias("_v")]
    if block_col:
        sel.insert(1, F.col(block_col))
    base = df.select(*sel).filter(F.col("_v").isNotNull())

    # size the collect BEFORE performing it (advice r7): a zero-
    # column count on the input (answered from parquet row-group
    # metadata on bare scans — a conservative UPPER bound, it counts
    # null-vector rows matmul won't collect) × dim probed from one
    # row (early-terminating single-partition job).  Near-zero cost
    # — a count×dim aggregate probe was tried first and cost a full
    # extra vector-column pass per call (+0.7s on the sf0.1
    # embedding_dedup row), and a limit(budget+1) collect serialized
    # the fetch through CollectLimit's incremental execution.  The
    # nbytes check below stays as the exact backstop (ragged dims,
    # null-heavy corpora where the upper bound was loose).
    n_bound = df.count()
    dim_row = base.select(F.size(F.col("_v")).alias("_d")).head(1)
    probe_dim = dim_row[0]["_d"] if dim_row else 0
    est_pre_mb = n_bound * max(probe_dim, 0) * 8 / (1 << 20)
    if est_pre_mb > max_broadcast_mb:
        # the upper bound counts null-vector rows the collect skips;
        # before rejecting, pay ONE exact non-null count so a null-
        # heavy corpus that genuinely fits isn't refused (advice r8)
        est_pre_mb = base.count() * max(probe_dim, 0) * 8 / (1 << 20)
    if est_pre_mb > max_broadcast_mb:
        raise ValueError(
            f"corpus matrix bounded at ~{est_pre_mb:.0f} MiB > "
            f"max_broadcast_mb={max_broadcast_mb} (pre-collect "
            "count×dim probe); block on an lsh_assign/ivf_assign "
            "column with bounded blocks, use strategy='expr', or "
            "raise the guard"
        )
    right_pdf = base.toPandas()
    n = len(right_pdf)
    out_schema = (
        f"id_a {id_field.dataType.simpleString()}, "
        f"id_b {id_field.dataType.simpleString()}, _raw double"
    )
    empty = spark.createDataFrame([], out_schema)
    if n == 0:
        return empty.select(
            "id_a", "id_b", F.col("_raw").alias("cosine")
        )
    mat = np.array(
        [np.asarray(v, dtype=np.float64) for v in right_pdf["_v"]]
    )
    if mat.ndim != 2:
        raise ValueError(
            "cosine_pairs matmul strategy requires fixed-dimension "
            "vectors; ragged input detected (use strategy='expr')"
        )
    est_mb = mat.nbytes / (1 << 20)
    if est_mb > max_broadcast_mb:
        raise ValueError(
            f"corpus matrix is ~{est_mb:.0f} MiB > max_broadcast_mb="
            f"{max_broadcast_mb}; block on an lsh_assign/ivf_assign "
            "column with bounded blocks, or raise the guard"
        )
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0  # zero vectors stay zero → cosine 0
    mat /= norms[:, None]
    ids_r = right_pdf[id_col].to_numpy()
    dim = mat.shape[1]
    if block_col:
        order = np.argsort(right_pdf[block_col].to_numpy(), kind="stable")
        mat, ids_r = mat[order], ids_r[order]
        blk_sorted = right_pdf[block_col].to_numpy()[order]
        uniq, starts = np.unique(blk_sorted, return_index=True)
        ends = np.append(starts[1:], n)
        slices = {
            b: (int(s), int(e)) for b, s, e in zip(uniq, starts, ends)
        }
        bc = spark.sparkContext.broadcast((ids_r, mat, slices))
    else:
        bc = spark.sparkContext.broadcast((ids_r, mat, None))
    # numpy pre-filter margin: HALF_UP round can lift a raw score by
    # at most 0.5*10^-round_to; a full 10^-round_to of slack also
    # absorbs any last-ulp summation-order divergence
    margin = float(threshold) - 10.0 ** (-round_to)
    chunk_cells = 4_000_000

    def gen(batches):
        ids_all, mat_all, blk_slices = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            lv = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            if lv.ndim != 2 or lv.shape[1] != dim:
                raise ValueError(
                    "ragged/mismatched vector dimension in "
                    "cosine_pairs matmul strategy"
                )
            ln = np.sqrt((lv * lv).sum(axis=1))
            ln[ln == 0] = 1.0
            lv /= ln[:, None]
            ids_l = pdf[id_col].to_numpy()
            blk_l = pdf[block_col].to_numpy() if blk_slices else None
            step = max(1, chunk_cells // max(1, len(ids_all)))
            for s in range(0, len(ids_l), step):
                e = min(s + step, len(ids_l))
                if blk_slices is None:
                    sims = lv[s:e] @ mat_all.T
                    mask = (sims >= margin) & (
                        ids_l[s:e, None] < ids_all[None, :]
                    )
                    li, ri = np.nonzero(mask)
                    if len(li):
                        yield pd.DataFrame(
                            {
                                "id_a": ids_l[s:e][li],
                                "id_b": ids_all[ri],
                                "_raw": sims[li, ri],
                            }
                        )
                else:
                    frames = []
                    for b in pd.unique(blk_l[s:e]):
                        rng = blk_slices.get(b)
                        if rng is None:
                            continue
                        bs, be = rng
                        lsel = np.nonzero(blk_l[s:e] == b)[0]
                        sims = lv[s:e][lsel] @ mat_all[bs:be].T
                        mask = (sims >= margin) & (
                            ids_l[s:e][lsel][:, None]
                            < ids_all[bs:be][None, :]
                        )
                        li, ri = np.nonzero(mask)
                        if len(li):
                            frames.append(
                                pd.DataFrame(
                                    {
                                        "id_a": ids_l[s:e][lsel][li],
                                        "id_b": ids_all[bs:be][ri],
                                        "_raw": sims[li, ri],
                                    }
                                )
                            )
                    if frames:
                        yield pd.concat(frames, ignore_index=True)

    raw = base.mapInPandas(gen, out_schema)
    return (
        raw.withColumn("cosine", F.round(F.col("_raw"), round_to))
        .filter(F.col("cosine") >= float(threshold))
        .select("id_a", "id_b", "cosine")
    )


# ---- LSH ---------------------------------------------------------------


def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_assign(
    df: DataFrame,
    nbits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    bucket_col: str = "_bkt",
) -> DataFrame:
    """Attach ``bucket_col`` = sign-bit LSH signature (Arrow pass).

    The hyperplanes are derived deterministically from ``(seed,
    vector dim)`` inside the UDF, so query-side signatures computed
    with the same seed land in the same buckets — no driver-side
    state to ship.  This is the persisted-index counterpart of
    :func:`ivf_assign`: materialize once (``write_ann_index``), then
    every probe is a bucket-pruned scan instead of a fresh UDF pass
    over the whole corpus.

    Null vectors get a NULL bucket (a real corpus has embedding
    gaps; equi-joins on the bucket never match NULL, so such rows
    simply never become candidates — they must not crash the
    assignment pass).
    """
    state: dict = {}

    @F.pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        out = pd.array([None] * len(vecs), dtype="Int32")
        mask = vecs.notna().to_numpy()
        if mask.any():
            mat = np.stack(vecs[mask].to_numpy())  # (batch, dim)
            planes = state.get("p")
            if planes is None:
                planes = state["p"] = _hyperplanes(
                    mat.shape[1], nbits, seed
                )
            bits = (mat @ planes.T) > 0  # (batch, nbits)
            weights = (1 << np.arange(nbits)).astype(np.int64)
            out[mask] = (bits @ weights).astype("int32")
        return pd.Series(out)

    return df.withColumn(bucket_col, bucket(_as_double(vec_col)))


def write_ann_index(
    df: DataFrame,
    path: str,
    bucket_col: str,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize an assigned corpus partitioned by its bucket column.

    ``df`` must already carry ``bucket_col`` (from :func:`lsh_assign`
    or :func:`ivf_assign`).  Writing ``partitionBy(bucket_col)`` makes
    every subsequent probe a *partition-pruned* scan — at 100 TB the
    probe reads only the matching bucket directories, never the full
    corpus, and the assignment UDF never re-runs.  Returns the
    read-back DataFrame to probe against.
    """
    df.write.mode(mode).partitionBy(bucket_col).parquet(path)
    out = df.sparkSession.read.parquet(path)
    # partition-column values come back via partition discovery;
    # normalize to int so .isin pruning matches the assign dtype
    return out.withColumn(bucket_col, F.col(bucket_col).cast("int"))


def _lsh_probe_buckets(
    query_vec: Sequence[float], nbits: int, seed: int, multiprobe: int
) -> list[int]:
    import itertools

    q = np.asarray([float(x) for x in query_vec])
    planes = _hyperplanes(len(q), nbits, seed)
    qbits = (planes @ q) > 0
    weights = (1 << np.arange(nbits)).astype(np.int64)
    qsig = int(qbits @ weights)
    probes = {qsig}
    for dist in range(1, min(multiprobe, nbits) + 1):
        for flips in itertools.combinations(range(nbits), dist):
            sig = qsig
            for b in flips:
                sig ^= 1 << b
            probes.add(sig)
    return [int(p) for p in probes]


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
    round_to: int = 6,
    index_df: DataFrame | None = None,
    bucket_col: str = "_bkt",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Corpus vectors are bucketed by an ``nbits`` sign-bit signature
    (one Arrow batch pass); only buckets within Hamming ≤
    ``multiprobe`` of the query's signature are exact-ranked.
    Expected candidate fraction ≈ (1 + nbits·multiprobe)/2^nbits of
    the corpus.  Same output schema as :func:`cosine_topk`; recall
    < 1 by construction (documented approximation).

    ``index_df``: a corpus already carrying ``bucket_col`` (from
    :func:`lsh_assign`, ideally persisted via :func:`write_ann_index`
    with the SAME nbits/seed) — the probe then filters the existing
    assignment instead of re-running the bucket UDF over the corpus,
    and against a partitioned index the scan prunes to the probed
    buckets only.
    """
    probes = _lsh_probe_buckets(query_vec, nbits, seed, multiprobe)
    if index_df is not None:
        cand = index_df.filter(F.col(bucket_col).isin(probes))
    else:
        cand = lsh_assign(df, nbits, seed, vec_col, bucket_col).filter(
            F.col(bucket_col).isin(probes)
        )
    return cosine_topk(cand, query_vec, k, id_col, vec_col, round_to)


# ---- IVF ---------------------------------------------------------------


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_n: int = 2048,
    iters: int = 10,
    seed: int = 42,
    order_by: str | None = None,
) -> np.ndarray:
    """K-means coarse centroids from a bounded driver-side sample.

    ``limit(sample_n)`` keeps driver memory constant regardless of
    corpus size; Lloyd iterations run in numpy.  Deterministic under
    ``seed`` *given the sample*; pass ``order_by=<id col>`` to pin
    the sample itself (``limit`` without an order is whatever rows
    arrive first) so repeated training runs yield identical
    centroids.  Returns ``(n_centroids, dim)``.
    """
    sample = df.orderBy(order_by) if order_by else df
    rows = sample.select(_as_double(vec_col).alias("v")).limit(sample_n).collect()
    x = np.array([r["v"] for r in rows])
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            pts = x[assign == c]
            if len(pts):
                cent[c] = pts.mean(0)
    return cent


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``_ivf`` = nearest-centroid index (Arrow batch pass).

    At 100 TB this column is what you bucket/partition the corpus by
    (``df.write.partitionBy('_ivf')``), making every probe a
    partition-pruned scan instead of a full pass.
    """
    cent = np.asarray(centroids)

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        return pd.Series(d.argmin(1).astype("int32"))

    return df.withColumn("_ivf", assign(_as_double(vec_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 42,
    round_to: int = 6,
    index_df: DataFrame | None = None,
    bucket_col: str = "_ivf",
) -> DataFrame:
    """Approximate cosine top-k via IVF coarse quantization.

    Trains (or reuses) coarse centroids, assigns corpus vectors, and
    exact-ranks only vectors in the ``nprobe`` centroids nearest the
    query — scanning ~nprobe/n_centroids of the corpus.  Same output
    schema as :func:`cosine_topk`.

    ``index_df``: a corpus already carrying ``bucket_col`` (from
    :func:`ivf_assign` with the SAME centroids, ideally persisted via
    :func:`write_ann_index`) — repeated queries then skip the
    assignment UDF entirely; against a partitioned index each probe
    is a partition-pruned scan.  ``centroids`` must be supplied
    alongside ``index_df`` (they define the probe order).
    """
    if index_df is not None and centroids is None:
        raise ValueError("index_df requires the centroids it was built with")
    if centroids is None:
        centroids = train_ivf_centroids(
            df, vec_col, n_centroids=n_centroids, seed=seed
        )
    q = np.asarray([float(x) for x in query_vec])
    d = ((centroids - q[None, :]) ** 2).sum(-1)
    probes = [int(i) for i in d.argsort()[:nprobe]]
    if index_df is not None:
        cand = index_df.filter(F.col(bucket_col).isin(probes))
    else:
        cand = ivf_assign(df, centroids, vec_col).filter(
            F.col(bucket_col).isin(probes)
        )
    return cosine_topk(cand, query_vec, k, id_col, vec_col, round_to)
