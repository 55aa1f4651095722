from wolf_quake_spark.sources.catalog import SinkCatalog  # noqa: F401
