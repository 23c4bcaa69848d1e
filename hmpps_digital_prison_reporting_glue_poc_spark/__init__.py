"""PySpark-native analytics engine with the capabilities of the
hmpps-digital-prison-reporting-glue-poc reference pipeline.

A library + 4 pipeline stages (landing -> structured -> curated -> domain),
re-expressed Spark-first: DataFrame/SQL declarative plans, window-based CDC
folds instead of driver-side row loops, partition-scoped incremental writes
instead of full-table rewrites, plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Reference parity map lives in SURVEY.md; each module docstring cites the
reference file:line it re-implements.
"""

__version__ = "0.1.0"

from hmpps_digital_prison_reporting_glue_poc_spark.session import get_spark  # noqa: F401
