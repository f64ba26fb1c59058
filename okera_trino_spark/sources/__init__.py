from okera_trino_spark.sources.catalog import (
    TABLE_NAMES,
    GovernedCatalog,
    load_table,
    register_tables,
)

__all__ = ["TABLE_NAMES", "GovernedCatalog", "load_table", "register_tables"]
