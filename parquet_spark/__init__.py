"""parquet_spark — a PySpark-native per-column lightweight-compression
engine with the capability surface of opentap/Parquet (encode -> buffer ->
row-group write -> schema-evolving merge -> decode round-trip), re-expressed
Spark-first: DataFrame plans, Arrow-vectorized codecs, range partitioning,
manifest/lineage commits.
"""

__version__ = "0.1.0"
