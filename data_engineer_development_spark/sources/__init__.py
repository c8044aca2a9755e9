from data_engineer_development_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    read_typed_csv,
    read_gz_text_clean,
)
