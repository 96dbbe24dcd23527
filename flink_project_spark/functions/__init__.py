from flink_project_spark.functions import scalars  # noqa: F401
