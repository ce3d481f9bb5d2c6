"""PySpark-native analytics engine with the query/data-processing
capabilities of cognitedata/datapoints-csv-extractor.

The reference (/root/reference/csv-extractor/csv_extractor.py) is a
single-purpose Python ETL loop: wide ';'-delimited latin-1 time-series
CSVs -> long (external_id, ts_ms, value) datapoints + an auto-created
time-series catalog, in batch ("historical") and polling ("live") modes.

This package re-expresses those semantics as lazy Spark DataFrame plans
(Catalyst-optimized, whole-stage-codegen friendly), adds the standard
relational operator surface, and extends with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from datapoints_csv_extractor_spark.session import get_spark  # noqa: F401
