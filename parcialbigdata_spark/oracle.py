"""Oracle-compare kernel shared by tools/check_correctness.py and
tests/test_correctness_full.py — a local simulation of the driver's
CORRECTNESS gate (row count + sorted column names + order-insensitive
value hash against a DuckDB run of the registered oracle SQL).

Keeping it in the package (not under tools/) lets the test suite
parametrize over the registry without sys.path games, so every query —
including the ones past the driver's 50-entry sampling window — keeps a
continuously-verified signal in ``pytest tests/``.
"""

from __future__ import annotations

import hashlib

import duckdb

from parcialbigdata_spark.sources.tables import TABLES


def norm_cell(v) -> str:
    """The driver's cell canonicalization: None→NULL, NaN→NaN, floats
    via %.6g, bools as 0/1, everything else str()."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    """Order-insensitive hash: columns sorted by name, rows sorted by
    their canonical rendering."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def duckdb_fixture_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with the fixture tables registered as views,
    exactly like the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(
    spark,
    con: duckdb.DuckDBPyConnection,
    fn,
    oracle: str | None,
    sf_dir: str,
) -> list[str]:
    """Run one registered query + its oracle; return a list of problem
    strings (empty = pass). ``oracle=None`` is the contract's weaker
    rows-only check: the query must run and return a DataFrame."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as exc:  # noqa: BLE001
        return [f"spark error: {exc}"]
    finally:
        # Queries are independent; drop operator-internal persists
        # (LSH band/shingle relations) so long sessions keep flat
        # executor storage.
        spark.catalog.clearCache()
    if oracle is None:
        return []
    try:
        res = con.execute(oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    except Exception as exc:  # noqa: BLE001
        return [f"oracle error: {exc}"]
    problems = []
    # fetchall() returns plain Python ints for DuckDB HUGEINT, so the
    # hash below is blind to the dtype drift that makes the DRIVER's
    # pandas-based kernel hash 7.0 vs 7 (r3 variant_event_props, r4
    # concurrent_sessions_hourly). Flag it explicitly from the
    # declared result schema: any HUGEINT output column would reach
    # the driver as float64.
    hug = hugeint_columns(con, oracle)
    if hug:
        problems.append(
            f"oracle HUGEINT drift (lands as float64 at the driver): {hug}"
        )
    if len(srows) != len(orows):
        problems.append(f"rows {len(srows)} != {len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
    elif value_hash(srows, scols) != value_hash(orows, ocols):
        problems.append("value-hash mismatch")
    return problems


def hugeint_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Output columns whose declared DuckDB type is (U)HUGEINT —
    DuckDB widens SUM(BIGINT) and windowed sums to HUGEINT, which
    pandas can only hold as float64, so the driver's kernel hashes
    '7.0' against Spark's '7'. Oracles must CAST such sums to BIGINT.
    Uses DESCRIBE (bind-only, no execution); returns 'col: HUGEINT'
    strings, empty when the oracle is clean or DESCRIBE can't bind."""
    try:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:  # noqa: BLE001 — non-describable statement
        return []
    return [f"{r[0]}: {r[1]}" for r in rows if "HUGEINT" in str(r[1]).upper()]
