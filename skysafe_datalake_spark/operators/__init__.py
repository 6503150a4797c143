"""Composed dataflow operators (reference SURVEY.md §2 + extensions)."""

from skysafe_datalake_spark.operators.nn_join import nearest_neighbor_join

__all__ = ["nearest_neighbor_join"]
