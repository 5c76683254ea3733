from moonlink_spark.table.catalog import Table, create_table, load_table  # noqa: F401
