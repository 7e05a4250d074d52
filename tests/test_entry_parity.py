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


def _spark_to_arrow(t: str) -> str:
    m = {
        "bigint": "int64", "int": "int32", "smallint": "int16",
        "tinyint": "int8", "double": "double", "float": "float",
        "string": "string", "boolean": "bool", "date": "date32[day]",
        "binary": "binary",
    }
    if t.startswith("decimal"):
        return "decimal128" + t[7:]
    if t.startswith("timestamp"):
        return "timestamp"
    return m.get(t, t)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_oracle_arrow_types(spark, sf_dir, duck, name):
    """The driver's value-hasher is type-sensitive at the Arrow level (r2's
    validate_report red row was INTEGER/HUGEINT vs BIGINT with equal values).
    Hold every oracle to exact Arrow-type parity with the Spark schema so the
    drift can't recur. Spark side needs no execution — schema only."""
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query, no oracle")
    sdf = entrymod.queries()[name](spark, sf_dir)
    stypes = {f.name: _spark_to_arrow(f.dataType.simpleString())
              for f in sdf.schema.fields}
    arrow_schema = duck.execute(oracles[name]).arrow().schema
    otypes = {}
    for f in arrow_schema:
        t = str(f.type).replace("large_string", "string").replace("large_binary", "binary")
        if t.startswith("timestamp"):
            t = "timestamp"
        # pyarrow prints 'decimal128(26, 12)' with a space; Spark-side
        # mapping produces 'decimal128(26,12)' — normalize before comparing
        t = t.replace(", ", ",")
        otypes[f.name] = t
    mismatches = {c: (stypes[c], otypes.get(c))
                  for c in stypes if stypes[c] != otypes.get(c)}
    assert not mismatches, f"{name}: arrow type drift {mismatches}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "speed" in df.columns and "url" in df.columns
