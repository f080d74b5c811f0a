from biobloom_ray.pipelines.build import build_filters, expected_entries
from biobloom_ray.pipelines.categorize import categorize, categorize_with_summary

__all__ = ["build_filters", "expected_entries", "categorize",
           "categorize_with_summary"]
