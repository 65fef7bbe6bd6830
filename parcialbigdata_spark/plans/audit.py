"""Plan-quality checks over ``explain("formatted")`` output.

The properties below are exactly the ones that decide whether a plan
survives a 100× scale-up (the first-pass plan that merely returns the
right rows usually does not):

- **pushed filters / pruned schema**: a parquet scan that reads every
  column for a two-column projection, or applies its predicate
  post-scan, multiplies I/O at scale.
- **join strategies**: broadcasts must be fixed-size dims only — a
  broadcast of a table that grows with the fact data is a driver OOM
  at scale (VERDICT r1 flagged exactly this).
- **codegen spans**: expressions outside WholeStageCodegen run
  interpreted, 10-100× slower per row.
- **exchange count**: every exchange is a full shuffle of its input;
  the minimum for a query shape is a design property worth pinning.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (JVM ExplainMode API;
    falls back to capturing ``df.explain`` output)."""
    try:
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        return df._jdf.queryExecution().explainString(mode)
    except Exception:  # noqa: BLE001
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def audit_plan(df: DataFrame) -> dict:
    """Summarize scale-relevant plan properties.

    Formatted explain output lists every operator twice (once in the
    numbered tree, once as a detail section ``(N) OperatorName``) — all
    counts below parse only the detail headers, so each physical
    operator is counted exactly once."""
    plan = physical_plan(df)
    ops = [
        o.strip()
        for o in re.findall(r"^\(\d+\) (.+?)(?: \[codegen id : \d+\])?$", plan, re.M)
    ]
    # "Scan parquet" may be catalog-qualified ("Scan parquet spark_catalog.db.t")
    op_count = lambda name: sum(1 for o in ops if o == name or o.startswith(name + " "))  # noqa: E731
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "n_parquet_scans": op_count("Scan parquet"),
        "n_scans_with_pushed_filters": sum(1 for p in pushed if p.strip()),
        "read_schemas": [s[:120] for s in read_schema],
        "n_exchanges": op_count("Exchange"),
        "n_broadcast_joins": op_count("BroadcastHashJoin") + op_count("BroadcastNestedLoopJoin"),
        "n_sortmerge_joins": op_count("SortMergeJoin"),
        "n_shuffled_hash_joins": op_count("ShuffledHashJoin"),
        "n_codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "has_python_row_udf": "BatchEvalPython" in plan,
        "has_arrow_udf": "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "ArrowEvalPythonUDTF" in plan,
        "top_k": "TakeOrderedAndProject" in plan,
    }


@contextmanager
def capture_checkpoint_builds():
    """Record the pre-checkpoint DataFrame at every ``localCheckpoint``
    call inside the block.

    A ``localCheckpoint`` replaces the logical plan with a LogicalRDD,
    so auditing only a query's RETURNED DataFrame is blind to the whole
    build phase of checkpointed operators — PLANS.md r4 recorded the
    set-similarity join (the repo's most expensive operator) as
    "0 scans / 0 exchanges" and the plan-regression gate could not
    catch a shuffle regression in its shingle build. Intercepting the
    method itself (rather than probe calls inside each operator) covers
    every current and future checkpoint site, including the per-round
    checkpoints of the iterative graph operators.

    Yields the list the captured DataFrames are appended to, in call
    order; eager checkpoints still execute normally."""
    # Spark 4 instances are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES the pyspark.sql.DataFrame base method — patching
    # only the base would never fire.
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

    captured: list[DataFrame] = []
    orig = ClassicDataFrame.localCheckpoint

    def patched(self, *args, **kwargs):
        captured.append(self)
        return orig(self, *args, **kwargs)

    ClassicDataFrame.localCheckpoint = patched
    try:
        yield captured
    finally:
        ClassicDataFrame.localCheckpoint = orig


def audit_executed_plan(df: DataFrame) -> dict:
    """Execute the DataFrame's own query and audit the FINAL adaptive
    plan.

    Under AQE the pre-execution formatted explain carries no codegen
    annotations (``n_codegen_spans`` reads 0 = "deferred"), so
    whole-stage-codegen regressions were invisible to the plan gate.
    ``collect()`` runs the DataFrame's own QueryExecution in place
    (``count()``/``write`` would build a separate one and leave this
    plan un-finalized); afterwards the formatted explain carries
    ``isFinalPlan=true`` plus real ``[codegen id : n]`` markers, and
    the audit's join/exchange counts reflect runtime re-planning
    (broadcast demotions, AQE coalesced shuffles, skew splits).

    Only call on bounded results (fixture-scale audits) — the
    collected rows are discarded."""
    df.collect()
    return audit_plan(df)


def audit_build_plans(dfs: list[DataFrame]) -> dict:
    """Aggregate the scale-relevant counts across captured
    pre-checkpoint build plans (see ``capture_checkpoint_builds``).
    Sums are deterministic at a fixed fixture: iterative operators
    contribute one probe per round, so a convergence change shows up
    as a probe-count change rather than silently."""
    agg = {
        "n_build_probes": len(dfs),
        "n_build_parquet_scans": 0,
        "n_build_exchanges": 0,
        "has_build_python_row_udf": False,
    }
    for df in dfs:
        a = audit_plan(df)
        agg["n_build_parquet_scans"] += a["n_parquet_scans"]
        agg["n_build_exchanges"] += a["n_exchanges"]
        agg["has_build_python_row_udf"] |= a["has_python_row_udf"]
    return agg
