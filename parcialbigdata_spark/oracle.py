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
        # The DRIVER fetches the oracle through pandas, which
        # downcasts HUGEINT and wide DECIMAL columns to float64
        # (rendering 32205642394166 as '3.22056e+13' under %.6g —
        # the r6 table_fingerprint_reconcile red row). fetchall()
        # returns exact ints/Decimals and so is blind to that drift;
        # reproduce the driver's dtype path by coercing every cell of
        # a pandas-float64 column to float, while keeping fetchall's
        # exact None-vs-NaN distinction for NULL fidelity. The
        # float64 column set is inferred from DESCRIBE (bind-only) +
        # the rows already fetched, so the oracle executes ONCE —
        # re-running it through fetchdf() just to read dtypes doubled
        # the cost of every recursive-CTE oracle.
        floaty = _float64_columns(con, oracle, orows)
        if floaty:
            fset = set(floaty)
            orows = [
                tuple(
                    float(v) if i in fset and v is not None else v
                    for i, v in enumerate(r)
                )
                for r in orows
            ]
    except Exception as exc:  # noqa: BLE001
        return [f"oracle error: {exc}"]
    problems = []
    # Belt-and-braces on top of the float64 coercion above: flag the
    # declared result schema directly, so the offending expression is
    # named in the failure message instead of just hash-mismatching.
    hug = hugeint_columns(con, oracle)
    if hug:
        problems.append(
            f"oracle dtype drift (lands as float64 at the driver): {hug}"
        )
    if len(srows) != len(orows):
        problems.append(f"rows {len(srows)} != {len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
    elif value_hash(srows, scols) != value_hash(orows, ocols):
        problems.append("value-hash mismatch")
    return problems


def _float64_columns(
    con: duckdb.DuckDBPyConnection, sql: str, rows: list[tuple]
) -> list[int]:
    """Indices of output columns duckdb's ``fetchdf()`` would hand the
    driver as pandas float64, WITHOUT executing the query again:
    HUGEINT/UHUGEINT/DOUBLE/DECIMAL columns always convert to float64,
    and integer columns convert iff they contain a NULL (duckdb fills
    NULL with NaN, forcing the float dtype) — verified against
    ``fetchdf().dtypes`` across the full type matrix in
    tests/test_oracle_lint.py. FLOAT lands as float32 (excluded here,
    matching the previous ``== float64`` check; its fetchall values
    are Python floats already, so coercion is a no-op either way).
    Falls back to one extra ``fetchdf()`` execution only when DESCRIBE
    cannot bind the statement."""
    import re

    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:  # noqa: BLE001 — non-describable statement
        dt = con.execute(sql).fetchdf().dtypes
        return [i for i, d in enumerate(dt) if str(d) == "float64"]
    always = re.compile(r"^(HUGEINT|UHUGEINT|DOUBLE|DECIMAL\()")
    integral = re.compile(r"^U?(TINYINT|SMALLINT|INTEGER|BIGINT)$")
    out: list[int] = []
    for i, row in enumerate(desc):
        t = str(row[1]).upper()
        if always.match(t):
            out.append(i)
        elif integral.match(t) and any(r[i] is None for r in rows):
            out.append(i)
    return out


def hugeint_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Output columns whose declared DuckDB type pandas can only hold
    as float64 — (U)HUGEINT (DuckDB widens SUM(BIGINT) and windowed
    sums to it), and DECIMAL with precision > 18 (beyond int64, so
    DuckDB's pandas conversion emits float64: the r6
    table_fingerprint_reconcile DECIMAL(38,0) red row). The driver's
    kernel then hashes '7.0' or '3.22056e+13' against Spark's exact
    rendering. Oracles must CAST such sums to BIGINT (or DOUBLE when
    the value is genuinely fractional). Uses DESCRIBE (bind-only, no
    execution); returns 'col: TYPE' strings, empty when the oracle is
    clean or DESCRIBE can't bind."""
    try:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:  # noqa: BLE001 — non-describable statement
        return []
    import re

    flagged = []
    for r in rows:
        t = str(r[1]).upper()
        if "HUGEINT" in t:
            flagged.append(f"{r[0]}: {t}")
            continue
        m = re.match(r"DECIMAL\((\d+)", t)
        if m and int(m.group(1)) > 18:
            flagged.append(f"{r[0]}: {t}")
    return flagged
