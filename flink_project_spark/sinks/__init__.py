from flink_project_spark.sinks import writers  # noqa: F401
