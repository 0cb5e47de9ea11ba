"""Reusable dataset functions: adaptive aggregation/dedup finals."""

from de_ray.functions.agg import adaptive_distinct, adaptive_grouped_sum  # noqa: F401
