from .table import ManagedTable, TableCatalog

__all__ = ["ManagedTable", "TableCatalog"]
