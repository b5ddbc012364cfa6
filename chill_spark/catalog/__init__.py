from .model import GRANULARITIES, LADDER_ORDER, Catalog, ColumnSpec, TableSpec

__all__ = ["GRANULARITIES", "LADDER_ORDER", "Catalog", "ColumnSpec", "TableSpec"]
