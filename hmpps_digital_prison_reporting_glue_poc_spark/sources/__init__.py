from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import (  # noqa: F401
    read_cdc_json,
    read_csv,
    read_parquet,
    read_table,
    write_partitioned_parquet,
    write_table,
    merge_write,
    HAS_DELTA,
)
