"""dr_source_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
thesp0nge/dr_source (studied read-only at /root/reference).

Not a port: detectors run as Arrow-vectorized pandas UDFs over a columnar
``source_files`` table; the rule knowledge base is a broadcast dimension;
findings/triples/nodes/edges are Spark DataFrames written to
partitioned parquet (Iceberg ``writeTo`` when a catalog is configured).
"""

__version__ = "0.1.0"
