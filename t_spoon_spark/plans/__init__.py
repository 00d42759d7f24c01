"""Physical-plan inspection utilities."""

from t_spoon_spark.plans.explain import (
    executed_plan,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)

__all__ = ["executed_plan", "pushed_filters", "scan_columns", "has_broadcast_join"]
