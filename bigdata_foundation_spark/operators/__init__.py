"""Relational, dedup, similarity, text and multimodal operators."""
