"""Sources & sinks: testdata loaders, nested-archive flatten, REST fetch."""

from chesscom_etl_tableau_spark.sources.tables import TESTDATA_TABLES, load_table, register_testdata

__all__ = ["TESTDATA_TABLES", "load_table", "register_testdata"]
