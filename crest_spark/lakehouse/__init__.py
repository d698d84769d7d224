from crest_spark.lakehouse.catalog import LakehouseCatalog
from crest_spark.lakehouse.table import LakehouseTable

__all__ = ["LakehouseCatalog", "LakehouseTable"]
