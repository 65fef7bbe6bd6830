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

from pyspark.sql import Column, DataFrame
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
