"""2× correctness sweep for the six quadratic oracle baselines.

The r6 sf1 (10×) replay sweep excluded six driver rows whose EXACT
all-pairs baselines grow ~100× in pair count on the replicated corpus
(`embedding_dedup`, `jaccard_pairs`, `ngram_jaccard_pairs`,
`dedup_clusters`, `dedup_keep_best`, `leakage_safe_split` — SCALE.md
"Correctness at 10× driver scale").  Their scale-path twins all ran at
sf1, but the exact baselines themselves had no >sf0.01 evidence.

This sweep closes that (r6 VERDICT #4): replica-scale the bench dir by
2× (pair counts grow ~4×), then replay exactly those six rows through
the driver-parity compare of tools/replay_contract.py.

Usage:
    python tools/quad_scale_sweep.py [src_sf_dir] [dst_dir]
    # defaults: /root/testdata/sf0.1 -> /tmp/spark_graft_sf02_x2
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUADRATIC_ROWS = [
    "embedding_dedup",
    "jaccard_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "dedup_keep_best",
    "leakage_safe_split",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf02_x2"

    from bench import _ensure_scaled_dir
    from semantic_olap_spark.session import get_spark

    spark = get_spark("quad-scale-gen")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_scaled_dir(spark, src, dst, factor=2)
    spark.stop()

    env = dict(os.environ, REPLAY_PANDAS_ONLY="1")
    code = subprocess.call(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "replay_contract.py"),
         dst, *QUADRATIC_ROWS],
        env=env,
    )
    sys.exit(code)


if __name__ == "__main__":
    main()
