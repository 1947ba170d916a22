from walex_spark.plans.audit import PlanReport, audit  # noqa: F401
