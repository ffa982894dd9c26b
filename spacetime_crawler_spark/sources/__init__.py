from spacetime_crawler_spark.sources.tables import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_tables,
)
