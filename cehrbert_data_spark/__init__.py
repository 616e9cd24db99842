"""cehrbert_data_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL library ``knatarajan-lab/cehrbert_data``
(see SURVEY.md): canonical clinical-event standardization, interval/as-of
joins, sessionization, windowed ranking, transitive closure over concept
hierarchies, nested-array patient-sequence assembly, and a templated-SQL
cohort framework — plus the large-scale training-data operators a modern
pipeline needs (dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7):
  * a generic, schema-agnostic operator library (``operators``, ``functions``)
  * a declarative clinical pipeline layer composed from it (``plans``)
  * everything DataFrame/Catalyst-native; Python UDFs only where built-in
    expressions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
