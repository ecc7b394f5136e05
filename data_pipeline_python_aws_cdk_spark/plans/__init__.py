"""Query-execution harness (reference entry point C)."""

from .executor import QueryExecutor, QueryStatus

__all__ = ["QueryExecutor", "QueryStatus"]
