"""flink_project_spark — a PySpark-native analytics engine.

Re-implements the full query/data-processing capability surface of the
reference workload (Eureka1996/flink-project — a Flink 1.6 recommendation
analytics stack, see SURVEY.md) as idiomatic PySpark:

- batch relational core (dashboard quality metrics)   -> operators.relational
- ranking / AUC / UAUC model-quality metrics          -> operators.auc
- item-based collaborative filtering                  -> operators.itemcf
- analytic window functions                           -> operators.windows
- set operations / top-k / histograms                 -> operators.setops
- LLM-data-pipeline: dedup / similarity / text / multimodal
                                                      -> operators.{dedup,similarity,text,multimodal}
- Structured Streaming parity (windows, state, sinks) -> streaming.*
- sources / sinks                                     -> sources.*, sinks.*

Design stance (SURVEY.md §7): DataFrame/SQL first, Catalyst optimizes,
no RDDs, Pandas UDFs only where built-ins genuinely can't express the
semantics. Every operator is a DataFrame -> DataFrame function so it
composes and (where legal) runs identically in batch and streaming.
"""

__version__ = "0.1.0"

from flink_project_spark.session import get_spark  # noqa: F401
