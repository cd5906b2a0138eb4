"""File sources/sinks (SURVEY §2.1 S4/S6): parquet, CSV, JSON, JSONL."""

from automated_data_pipeline_python_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
)
