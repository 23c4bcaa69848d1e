from hmpps_digital_prison_reporting_glue_poc_spark.functions.cdc_functions import (  # noqa: F401
    add_event_hashes,
    add_part_date,
    add_part_time,
    split_table_name,
)
from hmpps_digital_prison_reporting_glue_poc_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    stopword_ratio,
    md5_fingerprint,
)
from hmpps_digital_prison_reporting_glue_poc_spark.functions.vectors import (  # noqa: F401
    dot,
    l2_norm,
    cosine,
)
