"""Run one registered query by name and print its result.

Usage:
    python tools/run_query.py <query_name> [sf_dir] [--explain] [--limit N]

Examples:
    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py minhash_near_dups_documents /root/testdata/sf0.1 --explain
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.queries import QUERIES  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    # Parse flags (and their values) out FIRST so a flag value like the
    # N of `--limit N` never lands in the positional list.
    argv = list(argv)
    explain = "--explain" in argv
    if explain:
        argv.remove("--explain")
    limit = 20
    if "--limit" in argv:
        i = argv.index("--limit")
        try:
            limit = int(argv[i + 1])
        except (IndexError, ValueError):
            print("--limit requires an integer value")
            return 1
        del argv[i : i + 2]
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        print(f"unknown flags: {', '.join(unknown)}")
        return 1
    args = argv
    if not args:
        print(__doc__)
        print("Available queries:")
        for name in sorted(QUERIES):
            print(f"  {name}")
        return 1
    name = args[0]
    if name not in QUERIES:
        import difflib

        close = difflib.get_close_matches(name, QUERIES, n=3)
        print(f"unknown query {name!r}; did you mean: {', '.join(close)}?")
        return 1
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    spark = get_spark("run-query")
    df = QUERIES[name](spark, sf_dir)
    if explain:
        df.explain("formatted")
    df.show(limit, truncate=40)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
