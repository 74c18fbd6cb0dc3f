"""faers_datalakehouse_spark — a PySpark-native medallion analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``m-l-kaba/faers_datalakehouse`` (a Databricks PySpark+Delta medallion
lakehouse), re-expressed as idiomatic open-source Spark:

- ``session``   — SparkSession factory with AQE/shuffle tuning.
- ``sources``   — schema-enforced scans, ingestion metadata, catalog helpers,
                  latest-partition incremental reads, partitioned writers.
- ``functions`` — the column-expression library (date/numeric standardization,
                  decode ladders, bucketing, regex categorization, hashing) and
                  text-analysis expressions (lang-id, quality, tokens,
                  fingerprints).
- ``operators`` — composite algorithms: SCD Type 2 merge, deduplication
                  (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
                  search (brute-force + LSH-bucketed ANN), multimodal column
                  plumbing.
- ``plans``     — assembled pipelines: generated date dimension, star-schema
                  fact build, the analytics query suite.
- ``streaming`` — Structured Streaming variants of the ingest/agg paths.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join planning, and AQE; Python UDFs appear only as Arrow-batched Pandas UDFs
on genuinely non-relational paths (multimodal decode stubs).
"""

__version__ = "0.1.0"
