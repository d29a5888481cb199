"""Spark-vs-DuckDB comparison harness mimicking the driver's correctness
gate: row count + sorted-column-name schema + order-insensitive value
comparison."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals, dates, timestamps → canonical string
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return v


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark, sf_dir: str, spark_fn, sql: str, rel_tol: float = 0.0):
    """Run both sides; assert same columns, same row count, same values.

    ``rel_tol=0`` asserts bit-equality (our default contract); pass a
    small tolerance to triage which columns drift when debugging.
    """
    sdf = spark_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    con = duck_connection(sf_dir)
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()
    assert sorted(scols) == sorted(dcols), f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}"
    assert len(srows) == len(drows), f"row count differs: spark={len(srows)} duck={len(drows)}"
    s_n = normalize(srows, scols)
    d_n = normalize(drows, dcols)
    mismatches = []
    for i, (a, b) in enumerate(zip(s_n, d_n)):
        if a != b and not _rows_close(a, b, rel_tol):
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"value mismatches (spark vs duck): {mismatches}"


def _rows_close(a: tuple, b: tuple, rel_tol: float) -> bool:
    if rel_tol <= 0 or len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=rel_tol, abs_tol=1e-12):
                continue
        return False
    return True
