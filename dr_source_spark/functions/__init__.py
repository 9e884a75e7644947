"""Scalar function surface (SURVEY.md §2D): the engine's reusable
column-level builders, all JVM built-ins."""

from .scalars import (
    content_sha256,
    file_uri,
    flatten_trace,
    normalize_severity,
    split_trace,
)

__all__ = ["content_sha256", "file_uri", "flatten_trace", "normalize_severity", "split_trace"]
