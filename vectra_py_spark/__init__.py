"""vectra_py_spark — a PySpark-native analytics / vector-retrieval engine.

A ground-up re-expression of the capabilities of BMS-geodev/vectra-py
(a file-backed, Pinecone-style local vector database; see SURVEY.md) on
Spark DataFrames:

- columnar Parquet tables instead of one in-memory ``index.json``
- compiled ``Column`` predicate trees instead of a Python filter interpreter
  (:mod:`vectra_py_spark.filters`)
- Catalyst ``TakeOrderedAndProject`` top-k instead of full sorts
  (:mod:`vectra_py_spark.index`)
- pandas UDFs / mapInPandas for chunking and embedding
  (:mod:`vectra_py_spark.text`, :mod:`vectra_py_spark.embeddings`)
- MLlib LSH + bucketed ANN for similarity joins and dedup at scales the
  reference explicitly cannot reach (:mod:`vectra_py_spark.operators`)
"""

from vectra_py_spark.filters import compile_filter
from vectra_py_spark.index import SparkVectorIndex
from vectra_py_spark.session import get_spark

__all__ = ["compile_filter", "SparkVectorIndex", "get_spark"]
__version__ = "0.1.0"
