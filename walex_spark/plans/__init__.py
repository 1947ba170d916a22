from walex_spark.plans.audit import PlanReport, audit, formatted_plan  # noqa: F401
