"""Relational, dedup, similarity, text and multimodal operators."""

from bigdata_foundation_spark.operators._cache import release_operator_caches

__all__ = ["release_operator_caches"]
