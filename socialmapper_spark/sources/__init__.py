"""Source readers (SURVEY.md §2.1)."""

from socialmapper_spark.sources.custom_coords import read_custom_coordinates

__all__ = ["read_custom_coordinates"]
