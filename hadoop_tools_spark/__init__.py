"""hadoop_tools_spark — a PySpark-native analytics engine.

A from-scratch engine with the query/data-processing capabilities of
``jacobstanley/hadoop-tools`` (a native HDFS client + ``hh`` CLI for
filesystem metadata queries and bulk data movement), re-expressed
Spark-first per SURVEY.md: the filesystem surface becomes listing
DataFrames + DataFrame HDFS read/write, extended with a relational
core, scalar function surface, Structured Streaming operators, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Importing :mod:`hadoop_tools_spark.all_queries` registers every
declared query key into :mod:`hadoop_tools_spark.registry`.
"""

__version__ = "0.1.0"
