"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark AND its oracle_sql() twin on DuckDB over the same parquet
tables, compare row counts + order-insensitive values exactly."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then rows.
    Floats compare BITWISE (struct-packed) — the engine's oracles are held to
    bit-exact parity, not epsilon parity."""
    import struct

    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else struct.pack(">d", v).hex()
            elif isinstance(v, int) and not isinstance(v, bool):
                v = struct.pack(">d", float(v)).hex()  # long vs int32/hugeint
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_oracle_parity(spark, sf_dir, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    if name not in oracles:
        # rows-only check (driver's weaker path): must run and be stable
        assert isinstance(srows, list)
        return

    orel = duck.sql(oracles[name])
    orows = orel.fetchall()
    ocols = [d[0] for d in orel.description]

    assert sorted(scols) == sorted(ocols), f"{name}: column sets differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"

    s_norm = normalize([tuple(r) for r in srows], scols)
    o_norm = normalize(orows, ocols)
    mismatches = [i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={s_norm[mismatches[0]]} oracle={o_norm[mismatches[0]]}"
    )


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "speed" in df.columns and "url" in df.columns
