from okera_trino_spark.plans.explain import (
    assert_plan_contains,
    assert_pushed_filters,
    plan_string,
)

__all__ = ["assert_plan_contains", "assert_pushed_filters", "plan_string"]
