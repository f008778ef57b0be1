from resotodatalink_spark.sources.tables import TABLES, load_tables, table  # noqa: F401
