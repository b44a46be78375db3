"""data_warehouse_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference "data_warehouse_project" (a Streamlit +
MySQL events portal; see SURVEY.md). All relational semantics from the
reference's embedded SQL (reference db.py) are re-expressed as Spark
DataFrame / Spark SQL programs over a star schema, and the engine adds
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Design principles (see SURVEY.md §4, §7):
- DataFrame/SQL only; Catalyst + AQE pick physical strategies.
- Explicit schemas, parquet storage, predicate/projection pushdown.
- Broadcast dims, shuffle-on-key facts, AQE skew handling — sized for
  a 1000-executor / 100 TB deployment even though tests run local.
- Python UDFs only where built-ins cannot express the op, and then
  always Arrow-vectorized (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"
