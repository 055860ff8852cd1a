"""nyc_open_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (WilsonMinFong/nyc-open-data-pipeline), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Parquet
columnar storage, broadcast joins for dimensions, AQE for runtime re-planning,
and Pandas UDFs only where built-in operators cannot express the semantics.

Layout
------
- ``session``    SparkSession factory tuned for local test / cluster scale.
- ``catalog``    table registry over parquet directories (testdata or prod).
- ``operators``  relational operator library (dedup, windows, merge, reshape...).
- ``functions``  column-level function packs (text, vectors, geo, json docs).
- ``sources``    external connectors (Socrata SODA3, Census API, URL, shapefile).
- ``pipeline``   transformer plugin registry + validation + storage (ETL spine).
- ``plans``      the declared query surface (SURVEY.md §2 inventory) with
                 DuckDB oracle SQL for differential testing.
- ``streaming``  event-time windowed aggregation (tumbling/sliding/session).
"""

__version__ = "0.1.0"
