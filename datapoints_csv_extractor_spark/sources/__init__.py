from datapoints_csv_extractor_spark.sources.files import (  # noqa: F401
    find_historical_files,
    find_live_files,
)
from datapoints_csv_extractor_spark.sources.tebis_csv import (  # noqa: F401
    DATAPOINTS_SCHEMA,
    read_datapoints,
)
