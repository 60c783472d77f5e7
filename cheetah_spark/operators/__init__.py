"""Composite operators Spark lacks as single primitives, built from
DataFrame ops (SURVEY.md §2B: as-of join, dedup pipeline)."""

from cheetah_spark.operators.asof import asof_join
from cheetah_spark.operators.graph import connected_components

__all__ = ["asof_join", "connected_components"]
