"""Physical-plan introspection utilities (see ``plans.inspect``)."""

from .inspect import (
    exchange_schemas,
    executed_plan,
    file_scans,
    n_exchanges,
    partition_filters,
    pushed_filters,
    scanned_columns,
)

__all__ = [
    "exchange_schemas",
    "executed_plan",
    "file_scans",
    "n_exchanges",
    "partition_filters",
    "pushed_filters",
    "scanned_columns",
]
