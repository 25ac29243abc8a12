"""crypto_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
``facundofernandezmiguez/crypto-data-pipeline`` (see SURVEY.md), plus
the large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) the north star asks for.

Design principles (100 TB first):

* DataFrame/SQL only — every operator is a lazy Catalyst plan; no
  driver-side ``collect()`` loops, no RDDs.
* One shuffle per partition key — all per-entity window chains share a
  single ``Window.partitionBy(entity)`` so Catalyst reuses one Exchange.
* Broadcast the small side — dimension joins use ``F.broadcast``.
* Python only where the JVM can't express the semantics — and then
  Arrow-batched (``applyInPandas`` / ``mapInPandas``), never per-row.
"""

from crypto_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
