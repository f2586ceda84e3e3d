from .explain import assert_no_python_udf, formatted_plan, plan_summary  # noqa: F401
