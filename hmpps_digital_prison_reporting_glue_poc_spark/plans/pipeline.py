"""End-to-end pipeline orchestration: the reference's 4 Glue jobs as one
composable, catalog-driven unit.

Stage map (reference -> here):

1. landing    gg_logs_to_parquet.start()      -> run_landing()
2. structured apply_change_log_to_delta.start() -> run_structured()
3. curated    apply_to_curated.start()        -> run_curated()
4. domain     apply_to_domains.start()        -> run_domains() (plans.domains)

Differences from the reference (its own README lists these as flaws,
reference README.md:48-58):
- the event log is appended partition-by-partition, not rewritten;
- the structured merge is shuffle-based (operators.cdc.merge_cdc) and the
  write is the incremental merge sink, not a full-table overwrite;
- per-table work is derived from the event log with one distinct scan, and
  everything downstream of it is per-table DataFrame lineage — no driver
  collect of data rows (only the table-name list, which is metadata-scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hmpps_digital_prison_reporting_glue_poc_spark.catalog import Catalog
from hmpps_digital_prison_reporting_glue_poc_spark.functions.cdc_functions import (
    format_table_name,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import (
    apply_to_curated,
    ingest_events,
    map_events_to_target,
    merge_cdc,
)
from hmpps_digital_prison_reporting_glue_poc_spark.plans.domains import (
    run_domains,
)
from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import (
    read_cdc_json,
    write_partitioned_parquet,
)


@dataclass
class PipelineConfig:
    """Wiring for one source system's CDC flow."""

    raw_path: str                 # raw CDC JSON directory
    event_log_table: str          # catalog name of the parquet event log
    row_schema: T.StructType      # CDC before/after payload schema
    # logical table name -> (target catalog name, curated catalog name)
    tables: dict[str, tuple[str, str]] = field(default_factory=dict)
    validate_hash_chain: bool = False
    # quarantine malformed raw lines into <event_log_path>_quarantine
    quarantine: bool = False


def run_landing(
    spark: SparkSession, cfg: PipelineConfig, catalog: Catalog
) -> DataFrame:
    """Stage 1 (E1): raw JSON -> hashed, date-partitioned event log.
    Append-only — the event log is immutable history; partition pruning on
    part_date serves the downstream incremental reads."""
    spec = catalog.get(cfg.event_log_table)
    if cfg.quarantine:
        from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import split_corrupt

        raw, corrupt = split_corrupt(
            read_cdc_json(spark, cfg.raw_path, cfg.row_schema, quarantine=True)
        )
        corrupt.write.mode("append").parquet(spec.path + "_quarantine")
    else:
        raw = read_cdc_json(spark, cfg.raw_path, cfg.row_schema)
    log = ingest_events(raw)
    write_partitioned_parquet(log, spec.path, ["part_date"], mode="append")
    return log


def run_structured(
    spark: SparkSession, cfg: PipelineConfig, catalog: Catalog,
    event_log: DataFrame | None = None,
) -> list[str]:
    """Stage 2 (E2): event log -> per-table CDC merge into structured
    tables. Returns the list of touched logical table names (drives stage 4
    ACTIVE filtering, replacing the reference's hard-coded
    KINESIS_EVENTS_TABLES)."""
    log = (
        event_log
        if event_log is not None
        else catalog.read(spark, cfg.event_log_table)
    )
    tables = [
        r[0] for r in log.select(F.lower("table")).distinct().collect()
    ]  # metadata-scale collect (table names only)
    touched: list[str] = []
    for qualified in tables:
        name = format_table_name(qualified)
        if name not in cfg.tables:
            continue
        target_name, _ = cfg.tables[name]
        spec = catalog.get(target_name)
        target = catalog.read(spark, target_name)
        events = log.filter(F.lower("table") == qualified.lower())
        mapped = map_events_to_target(events, target.schema)
        merged = merge_cdc(
            target, mapped, pk=spec.pk,
            validate_hash_chain=cfg.validate_hash_chain,
        )
        # Self-referencing read->write: break lineage before overwrite.
        merged.localCheckpoint(eager=True).write.mode("overwrite").format(
            spec.format
        ).save(spec.path)
        touched.append(name)
    return touched


def run_curated(
    spark: SparkSession, cfg: PipelineConfig, catalog: Catalog,
    tables: list[str] | None = None,
    transform=None,
) -> list[str]:
    """Stage 3 (E3 bridge): structured -> curated, pluggable transform
    (identity today, reference src/apply_to_curated.py:153-161)."""
    done = []
    for name, (target_name, curated_name) in cfg.tables.items():
        if tables is not None and name not in tables:
            continue
        df = apply_to_curated(catalog.read(spark, target_name), transform)
        catalog.write(df, curated_name)
        done.append(name)
    return done


def run_pipeline(
    spark: SparkSession, cfg: PipelineConfig, catalog: Catalog,
    defs_df: DataFrame | None = None,
    process_id: int | None = None,
) -> dict[str, DataFrame]:
    """All four stages. Returns the materialised domain frames."""
    log = run_landing(spark, cfg, catalog)
    touched = run_structured(spark, cfg, catalog, event_log=log)
    run_curated(spark, cfg, catalog, tables=touched)
    if defs_df is None:
        return {}
    curated_touched = [cfg.tables[t][1] for t in touched]
    return run_domains(
        spark, defs_df, curated_touched, catalog,
        process_id=process_id, write=True,
    )
