"""Columnar CDC helper expressions (SURVEY.md §2.2 P1-P4, P12).

All pure Column expressions — JVM-side, whole-stage-codegen'd; no Python
row functions anywhere in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def add_event_hashes(df: DataFrame) -> DataFrame:
    """P2: Murmur3 fingerprints of the full before/after row images
    (reference src/gg_logs_to_parquet.py:162-173). ``F.hash`` over a struct
    column — the same function the reference's golden tests pin
    (reference tests/test_1_gg_logs_to_parquet.py:23-34), so hash parity
    holds as long as struct field order is preserved (schema-first read).
    """
    out = df
    if "after" in df.columns:
        out = out.withColumn("after_hash", F.hash(F.col("after")))
    if "before" in df.columns:
        out = out.withColumn("before_hash", F.hash(F.col("before")))
    return out


def add_part_date(df: DataFrame, ts_col: str = "op_ts") -> DataFrame:
    """P3: partition date from the first 19 chars of the GoldenGate
    timestamp string (reference src/gg_logs_to_parquet.py:183-190 —
    ``substring(op_ts,1,19).cast(date)``). Keeps the reference's exact
    truncate-then-cast semantics rather than to_date with a format."""
    return df.withColumn(
        "part_date", F.substring(F.col(ts_col), 1, 19).cast(T.DateType())
    )


def add_part_time(df: DataFrame, ts_col: str = "op_ts") -> DataFrame:
    """P4: HH:mm partition time (dormant branch in the reference,
    src/gg_logs_to_parquet.py:191-196)."""
    return df.withColumn(
        "part_time",
        F.date_format(
            F.substring(F.col(ts_col), 1, 19).cast(T.TimestampType()), "HH:mm"
        ),
    )


def split_table_name(col: Column) -> tuple[Column, Column]:
    """P12: ``"OMS_OWNER.OFFENDERS" -> ("oms_owner", "offenders")``
    (reference src/apply_change_log_to_delta.py:114-120,360-361) as columnar
    split/lower instead of Python str.split in a row loop."""
    parts = F.split(F.lower(col), r"\.")
    return parts.getItem(0), parts.getItem(1)


def format_table_name(name: str) -> str:
    """Driver-side variant for config values (small, not data-path)."""
    return name.lower().split(".")[-1]
