"""Privacy-risk auditing: k-anonymity / l-diversity report.

A record is k-anonymous when at least ``k`` records share its
quasi-identifier (QI) combination; an equivalence class is l-diverse
when its sensitive attribute takes at least ``l`` distinct values
(Sweeney 2002; Machanavajjhala et al. 2006). Before a corpus or a
customer extract ships to training or to a vendor, this audit answers
"how many records are re-identifiable at k" — the risk-measurement
counterpart to the remediation sibling ``redact_pii_documents``
(functions/text.py), which removes identifiers; this module measures
what the remaining quasi-identifiers still leak.

Scale design: one hash aggregation over the table (the QI groupBy —
map-side partial, shuffle carries one row per QI class), then one
conditional aggregation of the class relation down to a SINGLE row
holding every threshold's metrics, unpivoted driver-free with
``stack``. No threshold × class cross join: at 100 TB the class
relation can hold hundreds of millions of rows, and replicating it per
threshold (or shuffling it onto a handful of threshold keys — maximal
skew) is exactly the shape this avoids. Adding a threshold costs four
more conditional-sum lanes in the same reduce, not another pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def qi_classes(df: DataFrame, qi_cols: list[Column | str], sensitive_col: str) -> DataFrame:
    """Equivalence classes: one row per quasi-identifier combination,
    with its size ``n`` and sensitive-value diversity ``l``."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(sensitive_col)).alias("l"),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[Column | str],
    sensitive_col: str,
    thresholds: list[int] = (2, 5, 10, 20),
) -> DataFrame:
    """Per-threshold re-identification risk over the QI classes.

    Returns one row per ``k`` threshold:

    - ``k_threshold`` — the k being audited
    - ``classes_below`` — equivalence classes with fewer than k members
    - ``records_at_risk`` — records living in those classes
    - ``n_classes`` / ``k_min`` / ``min_l`` — global class count,
      worst-case anonymity, and worst-case sensitive diversity
      (identical on every row; kept per-row so the relation is
      self-contained).
    """
    classes = qi_classes(df, qi_cols, sensitive_col)
    lanes = []
    for k in thresholds:
        below = F.col("n") < F.lit(int(k))
        lanes.append(
            F.sum(F.when(below, 1).otherwise(0)).cast("bigint").alias(f"cb_{k}")
        )
        lanes.append(
            F.sum(F.when(below, F.col("n")).otherwise(0)).cast("bigint").alias(f"rar_{k}")
        )
    wide = classes.agg(
        *lanes,
        F.count(F.lit(1)).alias("n_classes"),
        F.min("n").alias("k_min"),
        F.min("l").alias("min_l"),
    )
    stack = ", ".join(
        f"CAST({int(k)} AS BIGINT), cb_{k}, rar_{k}" for k in thresholds
    )
    return wide.select(
        F.expr(
            f"stack({len(thresholds)}, {stack}) AS (k_threshold, classes_below, records_at_risk)"
        ),
        "n_classes",
        "k_min",
        "min_l",
    )


def recursive_cl_diversity_report(
    df: DataFrame,
    qi_cols: list[Column | str],
    sensitive_col: str,
    combos: list[tuple[int, int]] = ((2, 2), (2, 3), (3, 2)),
) -> DataFrame:
    """Recursive (c, l)-diversity audit (Machanavajjhala et al.,
    *l-Diversity: Privacy Beyond k-Anonymity*, ICDE'06 §4.2): an
    equivalence class with sensitive-value counts r1 ≥ r2 ≥ … ≥ rm
    (sorted descending) satisfies recursive (c, l)-diversity iff
    ``r1 < c · (rl + r(l+1) + … + rm)`` — the most frequent sensitive
    value must not dominate the tail beyond rank l. This catches the
    skew that plain distinct-count l-diversity (the ``min_l`` column
    of :func:`k_anonymity_report`) is blind to: a 1000-record class
    with counts (998, 1, 1) has l = 3 distinct values yet an attacker
    is 99.8% sure — recursive (2,2) flags it (998 ≥ 2·2).

    All-integer test (no log — entropy l-diversity needs one, the
    repo-wide no-libm determinism rule), and the rank-l tail cut is
    order-invariant under count ties (equal counts are interchangeable
    either side of the cut, so the tail SUM is a pure function of the
    sorted count multiset; the explicit value tie-break below is
    belt-and-braces for engines replaying the rank).

    Scale: one (QI, sensitive) hash agg — map-side combined, the only
    pass over the table — then a per-class rank window keyed on the QI
    (class-count-sized relation), one per-class agg, and one
    conditional agg down to a SINGLE row carrying every (c, l) combo's
    lanes, unpivoted with ``stack``: the same no-threshold-cross-join
    discipline as :func:`k_anonymity_report`. Returns one row per
    combo: (c, l, classes_violating, records_exposed, n_classes)."""
    ls = sorted({int(l) for _, l in combos})
    proj = df.select(*qi_cols, F.col(sensitive_col).alias("__sv"))
    qi_names = [c for c in proj.columns if c != "__sv"]
    sv = proj.groupBy(*qi_names, "__sv").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.partitionBy(*[F.col(n) for n in qi_names]).orderBy(
        F.desc("__cnt"), F.asc("__sv")
    )
    ranked = sv.withColumn("__rn", F.row_number().over(w))
    per_class = ranked.groupBy(*[F.col(n) for n in qi_names]).agg(
        F.max(F.when(F.col("__rn") == 1, F.col("__cnt"))).alias("r1"),
        F.sum("__cnt").alias("class_n"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("__rn") >= l, F.col("__cnt"))), F.lit(0)
            ).alias(f"tail_{l}")
            for l in ls
        ],
    )
    lanes = []
    for c, l in combos:
        viol = F.col("r1") >= F.lit(int(c)) * F.col(f"tail_{l}")
        lanes.append(
            F.sum(F.when(viol, 1).otherwise(0)).cast("bigint").alias(f"cv_{c}_{l}")
        )
        lanes.append(
            F.sum(F.when(viol, F.col("class_n")).otherwise(0))
            .cast("bigint")
            .alias(f"re_{c}_{l}")
        )
    wide = per_class.agg(*lanes, F.count(F.lit(1)).alias("n_classes"))
    stack = ", ".join(
        f"CAST({int(c)} AS BIGINT), CAST({int(l)} AS BIGINT), cv_{c}_{l}, re_{c}_{l}"
        for c, l in combos
    )
    return wide.select(
        F.expr(
            f"stack({len(combos)}, {stack}) AS "
            "(c, l, classes_violating, records_exposed)"
        ),
        "n_classes",
    )
