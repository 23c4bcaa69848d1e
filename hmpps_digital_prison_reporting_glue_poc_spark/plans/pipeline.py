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


def run_pipeline_streaming(
    spark: SparkSession, cfg: PipelineConfig, catalog: Catalog,
    checkpoint_dir: str,
    defs_df: DataFrame | None = None,
    process_id: int | None = None,
    max_files_per_trigger: int = 1,
    on_batch=None,
) -> int:
    """The same four stages as ``run_pipeline``, driven by Structured
    Streaming: ``readStream`` over the raw CDC JSON directory, and EVERY
    micro-batch runs landing-append -> per-table incremental merge ->
    curated -> domain refresh inside ``foreachBatch`` — the micro-batch
    design the reference's README lists as TODO (reference README.md:24-25;
    Kinesis trigger stubs src/apply_change_log_to_delta.py:521-528).

    Identical final state to the batch pipeline (pinned by
    tests/test_pipeline_stream_e2e.py): within a batch the GoldenGate
    ``pos`` order folds to one net image per key (``cdc_upsert_frame``),
    across batches the incremental ``merge_write`` applies each batch's
    net changes in source order — the same last-writer-wins algebra the
    batch path computes in one fold. Domains refresh per batch, so the
    domain tables are continuously correct, not only at drain time.

    Runs with ``availableNow`` + ``maxFilesPerTrigger`` (drain everything
    currently in the directory, in bounded micro-batches) and blocks until
    drained; a continuous deployment would drop the trigger and keep the
    same checkpoint. Returns the number of non-empty micro-batches.
    """
    from hmpps_digital_prison_reporting_glue_poc_spark.operators.cdc import cdc_upsert_frame
    from hmpps_digital_prison_reporting_glue_poc_spark.sources.io import (
        cdc_envelope_schema,
        merge_write,
    )

    log_spec = catalog.get(cfg.event_log_table)
    target_schemas = {
        name: catalog.read(spark, target_name).schema
        for name, (target_name, _) in cfg.tables.items()
    }
    n_batches = {"n": 0}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        n_batches["n"] += 1
        # stage 1: landing append (immutable event log, date-partitioned)
        log = ingest_events(batch_df)
        write_partitioned_parquet(
            log, log_spec.path, ["part_date"], mode="append"
        )
        # stage 2: per-table incremental merge of the batch's net changes
        tables = [
            r[0] for r in log.select(F.lower("table")).distinct().collect()
        ]  # metadata-scale (table names in this batch)
        touched = []
        for qualified in tables:
            name = format_table_name(qualified)
            if name not in cfg.tables:
                continue
            target_name, _ = cfg.tables[name]
            spec = catalog.get(target_name)
            events = log.filter(F.lower("table") == qualified.lower())
            mapped = map_events_to_target(events, target_schemas[name])
            net = cdc_upsert_frame(mapped, spec.pk)
            updates = net.select(
                *[f.name for f in target_schemas[name].fields], "__is_delete"
            )
            merge_write(
                spark, updates, spec.path, spec.pk, delete_col="__is_delete",
                partition_by=spec.partition_by or None,
            )
            touched.append(name)
            # stage 3, INCREMENTALLY: curated is the identity image of
            # structured (apply_to_curated's default), so merging the SAME
            # net updates into curated yields the same state as the batch
            # path's full copy — without rewriting the whole curated table
            # every micro-batch (round-6 streaming stress: the full copy
            # made per-batch cost grow with the table, the streaming
            # analogue of the reference's full-overwrite flaw).
            curated_name = cfg.tables[name][1]
            cspec = catalog.get(curated_name)
            merge_write(
                spark, updates, cspec.path, cspec.pk or spec.pk,
                delete_col="__is_delete",
                partition_by=cspec.partition_by or None,
            )
        if defs_df is not None and touched:
            curated_touched = [cfg.tables[t][1] for t in touched]
            run_domains(
                spark, defs_df, curated_touched, catalog,
                process_id=process_id, write=True,
            )
        if on_batch is not None:  # observability hook (stream stress)
            on_batch(batch_id)

    raw = (
        spark.readStream.schema(cdc_envelope_schema(cfg.row_schema))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(cfg.raw_path)
    )
    query = (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return n_batches["n"]
