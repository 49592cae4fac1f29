"""flink_and_acyclic_schema_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities demonstrated by the
reference repo ``Zxi-i/Flink-and-acyclic-schema`` (a hand-compiled Flink job that
maintains TPC-H Q10 as a continuous query over an insert/delete changelog —
see ``/root/reference/src/main/java/main/DataFlow.java``), generalized into a real
operator suite:

- batch relational operators (scan/filter/project/join/agg/window/sort/set ops)
  expressed with the DataFrame API so Catalyst + Tungsten pick the physical plan;
- a signed-weight changelog algebra replacing the reference's Alive/Dead/Add/Minus
  delta tags (SURVEY.md §1.3) — correct multiset retraction semantics;
- Structured Streaming incremental maintenance (foreachBatch weight-merge,
  watermarked windows);
- LLM-data-pipeline operators over documents/embeddings (dedup, similarity
  search, text analysis, multimodal column plumbing).

Nothing here is a port: the reference's ProcessFunction/Payload machinery is
replaced by declarative plans and built-in exchange/state management.
"""

__version__ = "0.1.0"
