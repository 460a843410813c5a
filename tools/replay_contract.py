"""Driver-style correctness replay: run every __spark_entry__ query
and its DuckDB oracle at a given sf dir, compare rows/schema/hash.

Usage: python tools/replay_contract.py [sf_dir] [only_query ...]
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _hash(rows, cols):
    h = hashlib.sha256()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for row in sorted(
        tuple(str(row[i]) for i in order) for row in rows
    ):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as entry
    from semantic_olap_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (
            rows_ok
            and schema_ok
            and _hash([tuple(r) for r in srows], scols)
            == _hash(orows, ocols)
        )
        mark = "pass" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if mark == "FAIL":
            bad.append(
                (name, f"rows {len(srows)}/{len(orows)} "
                       f"schema {schema_ok} hash {hash_ok} "
                       f"cols {scols} vs {ocols}")
            )
        print(f"{mark} {name}: rows {len(srows)}/{len(orows)}")
    print(f"\n{len(bad)} failures")
    for n, msg in bad:
        print(f"  {n}: {msg}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
