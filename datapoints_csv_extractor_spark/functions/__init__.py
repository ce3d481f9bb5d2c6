from datapoints_csv_extractor_spark.functions.tebis import (  # noqa: F401
    decimal_comma_double,
    file_timestamp,
    header_external_id,
    header_name,
    seconds_to_ms,
)
