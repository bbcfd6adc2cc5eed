"""prox_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-implementation of the query and
data-processing capabilities of the Andrew-Marfo/PROX lakehouse ETL
pipeline (reference surveyed in SURVEY.md), extended with the
operators a large-scale LLM training-data pipeline needs: exact and
approximate deduplication, similarity search over embeddings, text
analysis, and structured streaming.

Design principles (see SURVEY.md §4, §7):

- DataFrame/SQL declarative plans; Catalyst + Tungsten pick the
  physical strategy (pushdown, pruning, broadcast, AQE skew-join).
- No row-at-a-time Python UDFs in hot paths; Pandas UDFs (Arrow)
  only where built-ins genuinely can't express the semantics.
- Every operator designed for a 1000-executor cluster over ~100 TB:
  shuffles minimized, small dims broadcast, partitioning explicit.
"""

__version__ = "0.1.0"
