"""No oracle may emit a pandas-degrading DuckDB type.

The round-5 driver hash failures (sessionize_events,
quality_report_lineitem) were NOT engine bugs: DuckDB ``sum(INTEGER)``
returns HUGEINT (int128), which a pandas/Arrow fetch — the driver's
evident path — degrades to float64, so the stringified value reads
"9999.0" against Spark's "9999".  Two more oracles
(pagerank_suppliers, events_props_agg) carried the same latent class
and were queued for driver sampling.  All four were fixed with
explicit ``::BIGINT`` casts; this test pins the whole class out:
every oracle's DESCRIBE must be HUGEINT-free (and free of UHUGEINT,
the unsigned sibling with the same degradation).

Pure DuckDB — no SparkSession — so it runs in milliseconds and
guards every future oracle edit.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
_DEGRADING = ("HUGEINT", "UHUGEINT")

_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return c


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_output_types_survive_pandas_fetch(name, con):
    desc = con.execute("DESCRIBE " + _ORACLES[name]).fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(d in typ.upper() for d in _DEGRADING)
    ]
    assert not bad, (
        f"oracle {name!r} emits pandas-degrading column types {bad} — "
        f"cast them (e.g. ::BIGINT): HUGEINT becomes float64 under a "
        f"pandas fetch and hash-mismatches Spark's integer rendering"
    )
