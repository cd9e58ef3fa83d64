"""health_data_transformation_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo talzab/Health-Data-Transformation
(pandas + psycopg + PostgreSQL), re-expressed as Catalyst-optimized
DataFrame plans:

- ingest     : CSV -> normalize -> validate/quarantine -> dedup -> partitioned parquet
               (replaces /root/reference/load_hhs.py and load_quality.py row loops)
- plans      : the dashboard query set Q1-Q8b (/root/reference/Reporting.py)
               plus testdata analogues registered with the driver harness
- operators  : generalized operator library (cleaning, validation, dedup
               families incl. MinHash/SimHash/Jaccard near-dup, top-k,
               similarity search)
- functions  : deterministic aggregation helpers, text analysis, vector math
- streaming  : Structured Streaming variants of the ingest + windowed aggs

Everything is DataFrame-first: no driver-side row loops, no RDDs, no
row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
