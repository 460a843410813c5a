"""Graph analytics over edge frames: fixed-point PageRank.

The near-dup machinery already does one graph computation
(connected components, functions/dedup.py ``dedup_clusters``); this
module adds importance ranking for entity graphs a pipeline derives
from relational data (supplier→customer, doc→doc similarity, user
co-occurrence).

Design choice worth the docstring: ranks are **scaled integers**
(``rank × 10^12`` as BIGINT) and every update uses only integer
multiply / truncating divide.  Floating-point PageRank is not
reproducible across engines — reduction order changes the last ulps
— but fixed-point arithmetic is associative, so the whole iteration
is bit-exact everywhere: the driver oracle replays it in DuckDB CTE
form and hash-matches.  With SCALE=10^12 the quantization error per
update is ~10^-12 — far below anything that changes a ranking.

Update rule (simplified PageRank, dangling mass dropped — the
standard formulation when teleport handles sinks):

    r'(v) = (15·SCALE) div (100·N)  +  (85 · Σ_{u→v} (r(u) div out(u))) div 100

Scale shape: per iteration one node-sized join (ranks⋈out-degree →
per-source contribution), one fact-sized join of edges⋈per-source
(shuffle on src), and one ``groupBy(dst).sum`` — the textbook
distributed PageRank step with the per-edge division hoisted to
per-source.  Iterations are bounded and
lineage is cut per round (``localCheckpoint``, same rationale as
``dedup_clusters``: iterative self-joins otherwise stack
exponentially-growing plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from semantic_olap_spark.caching import lineage_cut

SCALE = 1_000_000_000_000  # 10^12: fixed-point denominator


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    rank_col: str = "rank_scaled",
    checkpoint_every: int = 5,
    broadcast_nodes: int = 1_000_000,
    driver_threshold: int = 1_000_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge frame.

    Returns ``(node, rank_scaled)`` for every node appearing as
    source or destination; ``rank_scaled`` is the PageRank value
    times ``SCALE``, an exact BIGINT.  Damping is fixed at the
    conventional 0.85 (as integer 85/100 — part of the exactness
    contract).  Duplicate edges count with multiplicity; pre-
    ``distinct()`` the frame for simple-graph semantics.

    ``checkpoint_every``: iterations between lineage cuts
    (caching.lineage_cut — ``localCheckpoint`` by default;
    ``checkpoint_dir`` switches the cuts AND the final result pin to
    reliable ``checkpoint()`` on a fault-tolerant store, the
    cluster-deployment mode where an executor loss mid-loop must not
    kill the job; ranks are bit-identical either way).  A short run
    (≤ ``checkpoint_every`` rounds)
    executes as ONE job over the whole unrolled DAG — measurably
    faster than materializing every round (no intermediate rank
    frames hit storage) — while long runs still bound plan growth.
    Results are bit-identical either way (integer arithmetic has no
    evaluation-order freedom to lose).

    ``broadcast_nodes``: node count at or below which the node-sized
    frames (per-source contributions, out-degrees, per-node sums)
    carry ``F.broadcast`` hints — ``n`` is already computed for the
    teleport term, so the pick costs nothing.  With the hints each
    iteration's edge-sized join is map-side against the broadcast
    contribution table and the ONLY wide exchange left per round is
    the partially-aggregated ``groupBy(dst)`` — the edge frame is
    never re-shuffled.  Graphs beyond the threshold keep the plain
    shuffle joins (AQE still localizes what it can); results are
    identical either way (a join hint never changes semantics).

    ``driver_threshold``: edge count at or below which the fixed
    point is computed on the driver in int64 numpy (one Arrow
    collect of the already-persisted edge frame — the data movement
    of a broadcast side; ~16 bytes/edge).  Same size-adaptive rule
    as ``dedup_clusters``: each distributed round costs a fixed
    multiple of job/shuffle latency that dwarfs the arithmetic on
    graphs this small.  The integer update (truncating div, exact
    int64 sums via ``np.add.at``) is bit-identical to the
    distributed loop — fixed-point arithmetic is associative, which
    is the module's whole design point — pinned by a
    driver-vs-distributed test.  ``driver_threshold=0`` forces the
    distributed loop.
    """
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).persist()
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    # schema of the (lazy) node frame — no job, used by both paths
    nodes_lazy = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst")))
        .distinct()
    )
    node_type = nodes_lazy.schema["node"].dataType
    m = e.count()  # one job: materializes the persist, sizes the pick
    if m == 0:
        e.unpersist()
        return nodes_lazy.withColumn(
            rank_col, F.lit(None).cast("long")
        ).select("node", rank_col)
    if m <= driver_threshold:
        # node count, degrees, and the whole fixed point come from
        # the one Arrow collect — the distributed path's nodes
        # distinct + count jobs never run
        import numpy as np

        epdf = e.toPandas()
        e.unpersist()
        srcv = epdf["_src"].to_numpy()
        dstv = epdf["_dst"].to_numpy()
        uniq = np.unique(np.concatenate([srcv, dstv]))
        si = np.searchsorted(uniq, srcv)
        di = np.searchsorted(uniq, dstv)
        nn = len(uniq)
        base = (15 * SCALE) // (100 * nn)
        deg = np.bincount(si, minlength=nn).astype(np.int64)
        safe_deg = np.where(deg > 0, deg, 1)  # sources always have deg>0
        r = np.full(nn, SCALE // nn, dtype=np.int64)
        for _ in range(int(iterations)):
            c = r // safe_deg  # == Spark `div` on nonnegative longs
            s = np.zeros(nn, dtype=np.int64)
            np.add.at(s, di, c[si])  # exact int64, unlike float bincount
            r = base + (85 * s) // 100
        schema = StructType(
            [
                StructField("node", node_type),
                StructField(rank_col, LongType()),
            ]
        )
        import pandas as pd

        # pandas in → Arrow-serialized to the JVM; a Python tuple
        # list at the 1M-node threshold costs ~1s of row-by-row
        # pickling that the Arrow path avoids entirely
        result_pdf = pd.DataFrame({"node": uniq, rank_col: r})
        return edges.sparkSession.createDataFrame(result_pdf, schema)
    nodes = nodes_lazy.persist()
    n = nodes.count()
    base = (15 * SCALE) // (100 * n)
    out_deg = e.groupBy("_src").agg(
        F.count(F.lit(1)).alias("_deg")
    ).persist()
    small = n <= broadcast_nodes
    hint = F.broadcast if small else (lambda d: d)
    deg_side = hint(out_deg)
    ranks = nodes.withColumn("_r", F.lit(SCALE // n).cast("long"))
    for i in range(int(iterations)):
        # per-SOURCE contribution first (node-sized join of two
        # node-sized frames), THEN the one fact-sized join against
        # edges — r div deg is constant per source, so computing it
        # per edge (the naive join order) would run a second
        # fact-sized join per iteration for the same integer
        per_src = (
            ranks.join(deg_side, ranks["node"] == deg_side["_src"])
            .select("_src", F.expr("_r div _deg").alias("_c"))
        )
        contrib = (
            e.join(hint(per_src), "_src")
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(hint(contrib), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(_s, 0L)) div 100")
                ).cast("long").alias("_r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = lineage_cut(ranks, checkpoint_dir)
    # materialize the node-sized result ONCE (running the whole
    # unrolled DAG while e/nodes/out_deg are still cached), then the
    # caches can drop — returning the lazy plan instead would
    # recompute the edge build per reference after the unpersists
    ranks = lineage_cut(ranks, checkpoint_dir)
    e.unpersist()
    nodes.unpersist()
    out_deg.unpersist()
    return ranks.select("node", F.col("_r").alias(rank_col))
