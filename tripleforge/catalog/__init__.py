from tripleforge.catalog.base import Catalog
from tripleforge.catalog.parquet_snapshot import ParquetSnapshotCatalog

__all__ = ["Catalog", "ParquetSnapshotCatalog"]
