from data_engineer_development_spark.sources.readers import (  # noqa: F401
    TABLES,
    fetch_to_landing,
    load_table,
    load_tables,
    read_external_partitioned,
    read_gz_text_clean,
    read_typed_csv,
    register_views,
)
