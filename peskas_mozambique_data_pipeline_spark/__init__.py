"""peskas_mozambique_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
WorldFishCenter/peskas.mozambique.data.pipeline (an R dplyr batch ETL
pipeline for fisheries landing surveys), re-expressed Spark-first:
declarative DataFrame plans optimized by Catalyst, designed for
100 TB-scale partitioned Parquet zones rather than single-node tibbles.

Modules
-------
session    SparkSession builder tuned for the engine (AQE, shuffle sizing).
io         Versioned Parquet zones + thin external-connector interfaces.
functions  Column-level helpers (recode, coalesce families, date/strings).
operators  Relational operator library (reshape, joins, aggregates,
           windows, dedup, similarity, text analysis, multimodal).
plans      End-to-end pipeline stages mirroring the reference's entry
           points (preprocess, validate, metrics, export, merge_trips).
streaming  Structured Streaming ingest of the landing zone.
"""

__version__ = "0.1.0"
