"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 (or $SPARK_GRAFT_SF_DIR) and
compares it against ``oracle_sql()`` via DuckDB: row count + sorted
column names + order-insensitive value hash. Queries without an oracle
get a rows-only check (must run and return a DataFrame).

The compare kernel lives in ``parcialbigdata_spark.oracle`` (shared
with tests/test_correctness_full.py).

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.oracle import (  # noqa: E402
    compare_query,
    duckdb_fixture_connection,
)
from parcialbigdata_spark.session import get_spark  # noqa: E402


def main() -> int:
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb_fixture_connection(sf_dir)
    spark = get_spark("correctness-check")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        problems = compare_query(spark, con, fn, oracles.get(name), sf_dir)
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        elif name not in oracles:
            print(f"ok    {name}: rows-only")
            n_pass += 1
        else:
            print(f"PASS  {name}")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
