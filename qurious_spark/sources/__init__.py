"""Source readers: csv / json (NDJSON) / parquet, plus the testdata loader."""

from qurious_spark.sources.readers import load_tables, read_auto, read_csv_like

__all__ = ["load_tables", "read_auto", "read_csv_like"]
