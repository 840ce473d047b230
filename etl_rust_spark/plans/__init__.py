"""Plan inspection & scale-property auditing (P6)."""

from etl_rust_spark.plans.audit import PlanReport, audit, explain_string

__all__ = ["PlanReport", "audit", "explain_string"]
