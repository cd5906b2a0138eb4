"""File sources/sinks (SURVEY §2.1 S4/S6): parquet, ORC, CSV, JSON/JSONL,
XML (Spark 4 built-in), line text, and whole-file binary (multimodal
ingest edge)."""

from automated_data_pipeline_python_spark.sources.files import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_csv_permissive,
    read_json,
    read_jsonl_permissive,
    read_orc,
    read_parquet,
    read_text,
    read_xml,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_text,
    write_xml,
)
