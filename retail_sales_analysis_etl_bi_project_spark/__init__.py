"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference retail ETL+BI project
(tharun-kadimi/Retail-Sales-Analysis-Etl-BI-Project), rebuilt
Spark-first from scratch.

Layout
------
- ``session``    : SparkSession factory (AQE, non-ANSI casts, tuned shuffle)
- ``sources``    : table loaders (parquet star schema, schema-ed CSV,
                   declarative synthetic generator)
- ``functions``  : scalar/column expression library (cleaning, derived
                   columns, date parts, exact-decimal money math)
- ``operators``  : dimensional build (dim_date, surrogate keys, upsert,
                   fact assembly, data-quality audits), dedup, similarity,
                   text analysis, multimodal plumbing
- ``plans``      : the flagship BI queries (Q1-Q4, K1-K4) as DataFrame
                   builders + SQL strings
- ``streaming``  : Structured Streaming over the events table
"""

__version__ = "0.1.0"
