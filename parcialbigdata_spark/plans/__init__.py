"""Physical-plan introspection (SURVEY.md §4).

No custom Catalyst rules exist (none are needed — §4); this package is
the *audit* side: helpers that read ``explain("formatted")`` output and
assert the plan properties the 100 TB design depends on — filters
pushed to the parquet scan, pruned read schemas, broadcasts only on
fixed-size dims, wide whole-stage-codegen spans, no stray exchanges.
``tools/plan_audit.py`` runs these over every registered query.
"""

from parcialbigdata_spark.plans.audit import audit_plan, physical_plan

__all__ = ["audit_plan", "physical_plan"]
