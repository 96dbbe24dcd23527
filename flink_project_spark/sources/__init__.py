from flink_project_spark.sources import readers  # noqa: F401
