"""Driver-style correctness replay: run every __spark_entry__ query
and its DuckDB oracle at a given sf dir, compare rows/schema/hash.

Round-6 rewrite for driver-harness parity.  The r05 driver flagged
two hash mismatches this tool's old fetchall() protocol could not
reproduce: DuckDB ``sum(INTEGER)`` returns HUGEINT (int128), which
``cursor.fetchall()`` converts to a Python int (stringifies like
Spark's bigint) but a pandas/Arrow fetch — the driver's evident
path — converts to float64 ("9999.0" vs "9999").  So the compare
here now runs BOTH protocols:

- **pandas protocol (the gate)**: spark ``.toPandas()`` vs duckdb
  ``.df()``, values stringified per-cell, columns sorted by name,
  rows sorted, sha256 — the closest local emulation of the driver.
- **native protocol (cross-check)**: ``collect()`` vs
  ``fetchall()`` — a disagreement between the two protocols is
  reported as a DTYPE warning even when both hash green, because it
  marks a query one fetch path away from a driver mismatch.

On a hash mismatch the first divergent sorted row of each side is
printed, so a driver failure becomes diagnosable from this artifact
alone.  ``--golden write`` stores per-query pandas-protocol hashes
in tools/golden_hashes.json; later runs report drift against it so
cross-round changes are visible without the driver.

Usage:
    python tools/replay_contract.py [sf_dir] [only_query ...]
    python tools/replay_contract.py --golden write [sf_dir]

Env knobs (driver-parity sweeps — the driver runs queries in ITS
session, not ours):
    REPLAY_SHUFFLE_PARTITIONS=200            divergent parallelism
    REPLAY_SESSION_TZ=America/Los_Angeles    divergent session tz
    REPLAY_PANDAS_ONLY=1   skip the native cross-check (halves the
                           collection cost — use for large sf dirs
                           where row-object collect() dominates)
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden_hashes.json"
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _cell(v) -> str:
    # temporal normalization: Spark DATE collects as datetime.date
    # ("2024-03-01") while DuckDB's pandas fetch renders DATE as
    # datetime64 midnight ("2024-03-01 00:00:00").  The r05 driver
    # PASSED monthly_growth (date-vs-timestamp schema) while failing
    # int-vs-float reprs, so its compare normalizes temporals but
    # stringifies numerics by dtype — mirror that: pad dates to
    # midnight, keep numerics strict (the strictness that caught the
    # HUGEINT class).
    import datetime

    if isinstance(v, datetime.date) and not isinstance(
        v, datetime.datetime
    ):
        return f"{v.isoformat()} 00:00:00"
    return str(v)


def _frame_rows(df) -> list[tuple[str, ...]]:
    """Pandas frame -> sorted stringified rows, columns sorted by name."""
    cols = sorted(df.columns)
    sub = df[cols]
    return sorted(
        tuple(_cell(v) for v in row)
        for row in sub.itertuples(index=False, name=None)
    )


def _hash_rows(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _native_rows(rows, cols) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_cell(row[i]) for i in order) for row in rows
    )


def _first_divergence(a: list, b: list) -> tuple[int, str, str]:
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return i, str(ra), str(rb)
    n = min(len(a), len(b))
    return n, str(a[n] if n < len(a) else "<end>"), str(
        b[n] if n < len(b) else "<end>"
    )


def merge_golden(
    existing: dict, new_hashes: dict, registry
) -> tuple[dict, list[str]]:
    """Merge a targeted --golden-write subset into an existing file,
    PRUNING keys no longer in the query registry so a renamed or
    deleted contract row can't mask drift behind a stale hash
    (advice r8)."""
    merged = dict(existing)
    merged.update(new_hashes)
    stale = sorted(set(merged) - set(registry))
    for k in stale:
        del merged[k]
    return merged, stale


def main():
    argv = list(sys.argv[1:])
    golden_write = False
    if argv[:2] == ["--golden", "write"]:
        golden_write = True
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry
    from semantic_olap_spark.session import get_spark

    sp = os.environ.get("REPLAY_SHUFFLE_PARTITIONS")
    tz = os.environ.get("REPLAY_SESSION_TZ")
    spark = get_spark(
        shuffle_partitions=int(sp) if sp else None,
        extra_conf={"spark.sql.session.timeZone": tz} if tz else None,
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # driver testdata is single files; Spark-written dirs (e.g.
        # the bench's replica-scaled sf1 copy) need a part-file glob
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
    # golden hashes are recorded at the driver's sf0.01 — comparing
    # them against another sf dir would report meaningless drift
    golden = {}
    if (
        os.path.exists(GOLDEN_PATH)
        and not golden_write
        and os.path.basename(sf_dir.rstrip("/")) == "sf0.01"
    ):
        with open(GOLDEN_PATH) as fh:
            golden = json.load(fh)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad, warns, drift = [], [], []
    hashes: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        pandas_only = os.environ.get("REPLAY_PANDAS_ONLY") == "1"
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            srows_native = None if pandas_only else sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            h = _hash_rows(_frame_rows(spdf))
            hashes[name] = h
            print(f"ok?  {name}: rows-only ({len(spdf)} rows) {h[:12]}")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            opdf = cur.df()
            orows_native = (
                None
                if pandas_only
                else con.execute(oracles[name]).fetchall()
            )
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {e}")
            continue

        rows_ok = len(spdf) == len(opdf)
        schema_ok = sorted(scols) == sorted(ocols)
        s_rows = _frame_rows(spdf)
        o_rows = _frame_rows(opdf)
        s_hash, o_hash = _hash_rows(s_rows), _hash_rows(o_rows)
        hashes[name] = s_hash
        hash_ok = rows_ok and schema_ok and s_hash == o_hash

        # cross-check: native protocol (old tool behavior)
        native_ok = hash_ok if pandas_only else (
            rows_ok
            and schema_ok
            and _hash_rows(_native_rows(srows_native, scols))
            == _hash_rows(_native_rows(orows_native, ocols))
        )
        if hash_ok != native_ok:
            warns.append(
                (name,
                 f"protocol disagreement: pandas={hash_ok} "
                 f"native={native_ok} — dtype fragility "
                 f"(spark {dict(spdf.dtypes.astype(str))} vs "
                 f"oracle {dict(opdf.dtypes.astype(str))})")
            )

        mark = "pass" if hash_ok else "FAIL"
        if not hash_ok:
            i, ra, rb = _first_divergence(s_rows, o_rows)
            bad.append(
                (name,
                 f"rows {len(spdf)}/{len(opdf)} schema {schema_ok} "
                 f"hash {s_hash[:12]}/{o_hash[:12]}\n"
                 f"    spark dtypes:  {dict(spdf.dtypes.astype(str))}\n"
                 f"    oracle dtypes: {dict(opdf.dtypes.astype(str))}\n"
                 f"    first divergent sorted row [{i}]:\n"
                 f"      spark:  {ra}\n"
                 f"      oracle: {rb}")
            )
        if name in golden and golden[name] != s_hash:
            drift.append((name, golden[name][:12], s_hash[:12]))
        print(f"{mark} {name}: rows {len(spdf)}/{len(opdf)} {s_hash[:12]}")

    if golden_write:
        merged = hashes
        if only and os.path.exists(GOLDEN_PATH):
            # targeted update: merge the replayed subset into the
            # existing file so one intentional contract-row change
            # doesn't require re-running all ~160 queries
            with open(GOLDEN_PATH) as fh:
                existing = json.load(fh)
            merged, stale = merge_golden(existing, hashes, qs)
            if stale:
                print(f"pruned {len(stale)} stale golden keys: "
                      f"{', '.join(stale)}")
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
        print(f"\nwrote {len(hashes)} golden hashes -> {GOLDEN_PATH}")

    print(f"\n{len(bad)} failures, {len(warns)} dtype warnings, "
          f"{len(drift)} golden drifts")
    for n, msg in bad:
        print(f"  FAIL {n}: {msg}")
    for n, msg in warns:
        print(f"  WARN {n}: {msg}")
    for n, old, new in drift:
        print(f"  DRIFT {n}: {old} -> {new}")
    sys.exit(1 if (bad or warns) else 0)


if __name__ == "__main__":
    main()
