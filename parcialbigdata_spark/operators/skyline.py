"""2-D skyline (Pareto frontier) operator.

The skyline of a relation under (minimize ``min_col``, maximize
``max_col``) is the set of rows not DOMINATED by any other row: ``d``
dominates ``o`` iff ``d.min_col <= o.min_col AND d.max_col >=
o.max_col`` with at least one strict. Börzsönyi, Kossmann & Stocker,
*The Skyline Operator* (ICDE 2001) introduced it as a relational
operator; the sort-based evaluation used here is Chomicki et al.'s SFS
(*Skyline with Presorting*, ICDE 2003) re-expressed as two window
passes instead of a sequential filter scan.

Why this shape for Spark: the naive NOT EXISTS formulation is a
quadratic theta self-join. For TWO dimensions, dominance collapses to
a prefix property — a row survives iff its ``max_col`` is strictly
greater than every strictly-cheaper row's best ``max_col``, and ties
on ``min_col`` keep only the group's best ``max_col``. That is:

1. collapse to one row per distinct ``min_col`` value (hash agg:
   ``best = max(max_col)``) — the working set drops from row count to
   distinct-value count;
2. running ``max(best)`` ordered by ``min_col``, then ``lag`` of it =
   best value among STRICTLY cheaper rows (the lag hop is what
   excludes same-value peers that a RANGE frame would include);
3. keep values where ``best > lag`` (or no cheaper row exists), then
   a semi-join back to the input re-attaches payload columns; equal
   (min_col, max_col) rows all survive — neither dominates the other.

Scale: the windows are PARTITIONED by the caller's group columns, so
each group's frontier computes independently after one shuffle (both
windows share the same partitioning+ordering — Catalyst reuses the
sort). The join back is distinct-value-sized → AQE broadcasts it. For
a GLOBAL skyline at 100 TB, skyline(∪ local skylines) = skyline
(dominance is transitive and local non-skyline rows are dominated by a
local skyline row), so run this per-partition and once more over the
union — the same two-level contract as ``operators/scan.py``'s carry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    group_cols: list[str],
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Rows of ``df`` on the per-group Pareto frontier of (minimize
    ``min_col``, maximize ``max_col``). Preserves ``df``'s columns.
    NULLs in either dimension are excluded (dominance is undefined)."""
    base = df.filter(F.col(min_col).isNotNull() & F.col(max_col).isNotNull())
    g = base.groupBy(*group_cols, min_col).agg(F.max(max_col).alias("__best"))

    order = F.col(min_col).asc()
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy(*group_cols).orderBy(order)
    keys = (
        g.withColumn("__run", F.max("__best").over(w_run))
        .withColumn("__prev", F.lag("__run").over(w_lag))
        .filter(F.col("__prev").isNull() | (F.col("__best") > F.col("__prev")))
        # rename: the keys relation descends from `base`, so keeping the
        # original names would make the join condition a self-join
        # ambiguity (Spark's failAmbiguousSelfJoin check).
        .select(
            *[F.col(c).alias(f"__k_{c}") for c in [*group_cols, min_col]],
            "__best",
        )
    )
    cond: Column | None = None
    for k in [*group_cols, min_col]:
        eq = base[k] == keys[f"__k_{k}"]
        cond = eq if cond is None else (cond & eq)
    out = base.join(keys, cond & (base[max_col] == keys["__best"]))
    return out.select(*[base[c] for c in df.columns])
