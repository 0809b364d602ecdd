from sayn_spark.sources.registry import TESTDATA_TABLES, load_tables, read_source  # noqa: F401
