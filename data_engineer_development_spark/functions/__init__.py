from data_engineer_development_spark.functions.frames import (  # noqa: F401
    jvm_rows_df,
)
from data_engineer_development_spark.functions.scalars import (  # noqa: F401
    dsum,
    davg,
    sentinel_to_null,
    decode_map,
    split_date_parts_to_date,
    base64_json,
    strip_nul,
)
