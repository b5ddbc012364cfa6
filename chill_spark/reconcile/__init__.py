from .compare import (
    TableReport,
    compare_tables,
    missing_rows,
    referential_violations,
    value_diff,
)

__all__ = [
    "TableReport",
    "compare_tables",
    "missing_rows",
    "referential_violations",
    "value_diff",
]
