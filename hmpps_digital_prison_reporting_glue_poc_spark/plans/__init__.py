from hmpps_digital_prison_reporting_glue_poc_spark.plans.domains import (  # noqa: F401
    DomainDefinition,
    load_definitions,
    active_definitions,
    run_definition,
    run_domains,
)
