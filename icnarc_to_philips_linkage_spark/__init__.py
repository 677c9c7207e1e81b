"""icnarc_to_philips_linkage_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference clinical ETL / record-linkage pipeline
``UHBristolDataScience/ICNARC-to-Philips-Linkage`` (surveyed in
``SURVEY.md``), plus the large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) the
reference never needed at its scale.

Design stance (SURVEY.md §7): everything is lazy DataFrame composition;
Catalyst does the optimizing; zero custom rules; Python UDFs only where
built-in functions genuinely cannot express the semantics (and then
Arrow-batched pandas UDFs, never row-at-a-time).
"""

from icnarc_to_philips_linkage_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
