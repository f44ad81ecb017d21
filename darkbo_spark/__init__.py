"""darkbo_spark — a PySpark-native knowledge-graph construction and
retrieval engine with the query/data-processing capabilities of the
reference system (muneebakhter/DARKBO), re-architected for the Spark
execution model (DataFrame/Catalyst/Arrow) at web scale.
"""

__version__ = "0.1.0"
