"""External connectors (SURVEY §2.1): Socrata SODA3, Census API, URL, shapefile.

Connectors use the PySpark Python Data Source API (Spark 4) so that fetches
run IN EXECUTORS as planned partitions (page ranges / geo chunks), with
source-level predicate pushdown — the Spark-native re-expression of the
reference's driver-side sequential pagination.
"""

from nyc_open_data_pipeline_spark.sources.census import CensusDataSource
from nyc_open_data_pipeline_spark.sources.socrata import SocrataDataSource


def register_data_sources(spark) -> None:
    """Register all custom data sources on a session."""
    spark.dataSource.register(SocrataDataSource)
    spark.dataSource.register(CensusDataSource)
