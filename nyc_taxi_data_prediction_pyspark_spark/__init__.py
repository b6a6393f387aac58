"""PySpark-native analytics engine with the capability surface of
``abhinitasanabada-web/nyc-taxi-data-prediction-pyspark`` (see SURVEY.md).

Everything is expressed through the DataFrame/SQL API so Catalyst +
Tungsten own the physical plan; Python never sits in the per-row hot
path except where an operator is genuinely inexpressible as built-ins
(documented per module).

Layout
------
- ``session``    SparkSession factory (local test profile + cluster posture)
- ``schemas``    explicit StructType contracts (reference DDL equivalents)
- ``catalog``    testdata table loaders / temp-view registration
- ``operators``  relational + LLM-data operators (SURVEY.md §2 inventory)
- ``sources``    ingestion front-end (partition discovery, CSV parity, REST)
- ``functions``  scalar/vector helpers (JSON extraction, cosine, hashing)
- ``streaming``  Structured Streaming variants of the batch pipelines
- ``ml``         MLlib demand-forecast pipeline (reference "prediction" goal)
"""

__version__ = "0.1.0"
