"""spark_iforest_spark — a PySpark-native Isolation Forest analytics engine.

A from-scratch rebuild of the capabilities of titicaca/spark-iforest
(reference: /root/reference, Scala ML Estimator) as a pure-Python
``pyspark.ml`` pipeline stage, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
that a 100 TB corpus pipeline needs.

Design stance (SURVEY.md §7): DataFrames end-to-end; the only
Python-executed operators are one ``applyInPandas`` (training) and one
``pandas_udf`` (scoring); everything else is Catalyst expressions.
"""

from spark_iforest_spark.iforest import IForest, IForestModel, IForestSummary

__version__ = "0.1.0"

__all__ = ["IForest", "IForestModel", "IForestSummary", "__version__"]
