from pdf_parse_vector_db_spark.sources.registry import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
