"""Randomized differential fuzzing vs DuckDB (r8 verdict task 6).

The 315 registered oracles pin hand-chosen fixtures; edge semantics
(empty inputs, single rows, ties everywhere, all-NULL measure columns,
zero-variance groups) are covered only where a test author thought of
them. This harness generates SEEDED random table sets with the exact
production schemas (read from the committed sf0.001 parquet footers) and
runs a cross-family sample of ``queries()`` entries against their own
``oracle_sql()`` twins on the same bytes — both engines see identical
data, so any mismatch is a genuine cross-engine semantics divergence,
not a fixture artifact.

Seed plan (committed, deterministic):
- ``empty``   every fact table 0 rows (dims tiny) — degenerate guards
- ``single``  1 row per fact table — window/percentile/variance edges
- ``ties``    every value/date/type constant — tie-breaks, zero variance
- ``nulls``   nullable measure columns all NULL — null propagation
- ``101`` / ``202``  dense random with heavy duplicate collisions

Any divergence found here should be fixed AND pinned as a regression
fixture in the owning wave's test file.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod
from test_oracle_parity import TABLES, _normalise

REAL_SF = "/root/testdata/sf0.001"
SEEDS = ["empty", "single", "ties", "nulls", "101", "202"]

# >= 20 operator families, one registered query per family; each runs
# against its own committed oracle on every seed's tables.
FUZZ_QUERIES = [
    "q1_pricing_summary",          # wide agg + decimal money path
    "q3_shipping_priority",        # 3-table join + top-k
    "q21_waiting_suppliers",       # multi-EXISTS / anti-join (stale tail)
    "window_rank_orders",          # rank window
    "window_lag_delta",            # lag window
    "percentiles_by_flag",         # exact percentiles
    "weighted_median_price_by_flag",  # weighted order statistics
    "histogram_order_totals",      # bucketed histogram
    "ntile_value_buckets",         # ntile
    "argmax_order_per_customer",   # struct argmax
    "dedup_exact_groups",          # exact dedup groups
    "normalized_dedup_groups",     # normalized dedup
    "minhash_signatures",          # minhash family
    "lsh_candidate_pairs",         # banded LSH self-join
    "neardup_ingest_gate",         # near-dup store gate (wave 95)
    "simhash_sketches",            # simhash bits
    "text_token_stats",            # tokenizer stats
    "text_language_id",            # n-gram language id
    "token_frequency",             # vocabulary rollup
    "bm25_doc_scores",             # bm25 retrieval
    "hill_token_tail_alpha",       # power-law tail (small-vocab guard)
    "event_transition_counts",     # event bigram transitions
    "sessionize_events",           # session_window semantics
    "scd2_user_history",           # SCD2 intervals
    "forward_fill_events",         # last_value forward fill
    "stats_summary",               # moments/stddev
    "kruskal_wallis_qty_by_flag",  # midrank grid (r8 break site)
    "brunner_munzel_qty_by_status",  # rank stat (r9 decimal fix)
    "rank_dependence_qty_price",   # copula grid + auto width
    "fk_orphan_audit_tables",      # referential audit
    "pk_uniqueness_tables",        # uniqueness audit
    "ann_cosine_topk",             # brute cosine top-k
    # second sweep (r9): time-series / distribution / subquery edges
    "ohlc_resample_events",        # first/last per window
    "theil_sen_daily_revenue",     # median pairwise slope
    "benford_order_totals",        # leading-digit distribution
    "updown_streaks_revenue",      # sign runs
    "cusum_daily_revenue",         # cumulative deviation
    "acf_daily_revenue",           # autocorrelation lags (short series)
    "markov_stationary_events",    # iterative transition power
    "token_zipf",                  # two-level rank
    "equifreq_price_edges",        # equi-frequency edges under ties
    "js_divergence_sources",       # zero-probability smoothing
    "psi_value_drift",             # drift bins
    "ks_value_drift",              # KS statistic
    "quantile_normalize_doclen",   # quantile normalization
    "heaps_vocab_growth_docs",     # vocab growth curve
    "doclen_lognormal_docs",       # ln over zero-token docs
    "welch_t_qty_by_status",       # n<2 / zero-variance guards
    "dunn_pairwise_qty_flag",      # post-hoc pairwise z
    "mode_event_type_per_user",    # mode tie-break
    "date_spine_zero_fill",        # generated spine vs empty facts
    "cohort_retention_weekly",     # cohort triangles
    "funnel_view_click_purchase",  # ordered funnel
    "correlated_scalar_subquery",  # correlated scalar subquery
    "q17_small_qty_revenue",       # avg subquery against empty inner
    "auc_value_purchase",          # exact AUC midranks
    # third sweep (r9): SQL surface, set ops, joins, CDC, privacy
    "pivot_event_counts",          # pivot
    "rollup_lineitem",             # ROLLUP grouping sets
    "cube_lineitem",               # CUBE grouping sets
    "grouping_sets_orders",        # explicit grouping sets
    "q16_supplier_count",          # distinct counting + NOT IN
    "q19_disjunctive_revenue",     # disjunctive predicate pushdown
    "q22_idle_customers",          # anti join + avg subquery
    "collect_sorted_events",       # sorted collect as string
    "except_all_purchases",        # EXCEPT ALL multiplicity
    "intersect_all_events",        # INTERSECT ALL multiplicity
    "asof_join_events",            # as-of join
    "range_join_events",           # range join
    "full_outer_reconciliation",   # full outer join
    "incremental_agg_events",      # incremental aggregation
    "moving_avg_time_window",      # time-window moving average
    "rolling_active_users",        # rolling distinct window
    "window_first_event",          # min-over window (reference W1)
    "regexp_extract_ids",          # regex extraction
    "json_props_extract",          # JSON path extraction
    "map_functions",               # map construction/probing
    "array_functions",             # array surface
    "null_handling_functions",     # coalesce/nvl/nullif surface
    "date_arithmetic",             # date add/diff/trunc
    "string_functions",            # string surface
    "unpivot_lineitem_measures",   # unpivot/stack
    "profile_lineitem",            # column profiling
    "k_anonymity_events",          # k-anonymity rollup
    "revenue_lorenz_deciles",      # Lorenz curve deciles
    "winnow_doc_fingerprints",     # winnowing fingerprints
    "cdc_last_writer_wins",        # CDC ordered fold (reference A4)
    # fourth sweep (r9 waves 96-102): survival, communities, recurrences
    "kaplan_meier_conversion",     # KM curve (zero-survival tail)
    "logrank_ab_conversion",       # hypergeometric E/V one-row contract
    "lpa_token_communities",       # fixed-round label propagation
    "cramers_v_segment_nation",    # micros chi2 rollup + degenerate df
    "page_hinkley_daily_revenue",  # running-mean changepoint
    "holt_linear_daily_revenue",   # integer-state recurrence vs rec. CTE
    "g_test_lang_source",          # o*ln(o/e) with zero-cell limit
    "link_prediction_tokens",      # neighbor-cap bucket join (deg>=2)
    "nelson_aalen_conversion",     # additive hazard
    "vocab_richness_docs",         # Chao1/Good-Turing one-row contract
    "holt_winters_daily_revenue",  # 7-slot seasonal integer recurrence
    "mcnemar_click_purchase",      # paired-binary concordance cells
    "cochran_q_events",            # k matched treatments, all-integer Q
    "token_burstiness_top",        # Fano factor with zero-doc inclusion
    "source_vocab_overlap_pairs",  # rank-window head-vocab Jaccard
    "wilcoxon_user_halves",        # signed-rank midranks + tie term
    "friedman_user_spend",         # within-block midranks, integer Q
    # fifth sweep (r10 wave 107): grid-ECDF distance functionals
    "wasserstein_value_drift",     # exact earth-mover via |d|*gap
    "cvm_value_drift",             # pooled-mass-weighted (F1-F2)^2
    "energy_value_drift",          # Cramer distance 2*int (F1-F2)^2 dx
    "w1_drift_by_type",            # per-group W1, null-safe group joins
    "mmd2_embedding_drift",        # moment-factorized quadratic MMD^2
    # sixth sweep (r11 waves 109-111): tail/spread/center drift +
    # rank changepoint
    "ad_value_drift",              # A2_akN, exact floor-div micro-units
    "ks_drift_by_type",            # per-group KS, null-safe group joins
    "brown_forsythe_value_by_type",  # |x - median| ANOVA terms
    "median_test_value_by_type",   # pooled-median split chi2 terms
    "pettitt_change_daily",        # midrank changepoint scan
]

_VOCAB = (
    "spark group query row data slow small filter cache join window "
    "stream customer order table scan merge part key sort shuffle plan"
).split()
_EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
_LANGS = ["en", "de", "zh", "fr", "es"]
_SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
_STATUS = ["P", "O", "F"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_RFLAG = ["A", "N", "R"]
_LSTATUS = ["O", "F"]


def _text(rng, mode, n_min=3, n_max=40):
    if mode == "ties":
        return "spark group query row data filter join window"
    n = int(rng.integers(n_min, n_max))
    return " ".join(rng.choice(_VOCAB, size=n))


def _day_us(rng, mode, base=820454400, span_days=2000):
    """microsecond epoch timestamps on day boundaries (1996 + span)."""
    if mode == "ties":
        return (base + 100 * 86400) * 1_000_000
    return (base + int(rng.integers(0, span_days)) * 86400) * 1_000_000


def _sizes(mode):
    if mode == "empty":
        return dict(customer=0, supplier=0, part=0, orders=0, lineitem=0,
                    events=0, documents=0, embeddings=0)
    if mode == "single":
        return dict(customer=1, supplier=1, part=1, orders=1, lineitem=1,
                    events=1, documents=1, embeddings=1)
    return dict(customer=30, supplier=10, part=20, orders=80, lineitem=200,
                events=250, documents=40, embeddings=24)


def _gen_tables(mode: str) -> dict[str, dict[str, list]]:
    # zlib.crc32, not hash(): str hash is salted per process and would
    # make the "deterministic, committed seeds" claim false
    import zlib

    rng = np.random.default_rng(
        int(mode) if mode.isdigit() else zlib.crc32(mode.encode())
    )
    nz = _sizes(mode)
    ties = mode == "ties"
    nulls = mode == "nulls"

    def val(lo, hi, r=2):
        return 42.0 if ties else (None if nulls else round(float(rng.uniform(lo, hi)), r))

    t: dict[str, dict[str, list]] = {}
    t["region"] = {
        "r_regionkey": list(range(5)),
        "r_name": [f"REGION{i}" for i in range(5)],
    }
    t["nation"] = {
        "n_nationkey": list(range(25)),
        "n_name": [f"NATION{i}" for i in range(25)],
        "n_regionkey": [i % 5 for i in range(25)],
    }
    n = nz["customer"]
    t["customer"] = {
        "c_custkey": list(range(1, n + 1)),
        "c_name": [f"Customer#{i}" for i in range(1, n + 1)],
        "c_nationkey": [int(rng.integers(0, 25)) for _ in range(n)],
        "c_acctbal": [val(-500, 5000) for _ in range(n)],
        "c_mktsegment": [
            _SEGMENTS[0] if ties else str(rng.choice(_SEGMENTS)) for _ in range(n)
        ],
    }
    n = nz["supplier"]
    t["supplier"] = {
        "s_suppkey": list(range(1, n + 1)),
        "s_name": [f"Supplier#{i}" for i in range(1, n + 1)],
        "s_nationkey": [int(rng.integers(0, 25)) for _ in range(n)],
        "s_acctbal": [val(-500, 5000) for _ in range(n)],
    }
    n = nz["part"]
    t["part"] = {
        "p_partkey": list(range(1, n + 1)),
        "p_name": [
            f"{rng.choice(['cold', 'small', 'large'])} "
            f"{rng.choice(['widget', 'bolt', 'gear'])}"
            for _ in range(n)
        ],
        "p_brand": [f"Brand#{int(rng.integers(1, 6))}" for _ in range(n)],
        "p_type": [str(rng.choice(["ECONOMY", "PROMO", "STANDARD"])) for _ in range(n)],
        "p_size": [int(rng.integers(1, 50)) for _ in range(n)],
        "p_retailprice": [val(100, 2000) for _ in range(n)],
    }
    n = nz["orders"]
    # deliberate orphans: some custkeys beyond the customer table (fk audit)
    t["orders"] = {
        "o_orderkey": list(range(1, n + 1)),
        "o_custkey": [int(rng.integers(1, max(nz["customer"], 1) + 3)) for _ in range(n)],
        "o_orderstatus": [
            _STATUS[0] if ties else str(rng.choice(_STATUS)) for _ in range(n)
        ],
        "o_totalprice": [42.0 if ties else round(float(rng.uniform(100, 30000)), 2) for _ in range(n)],
        "o_orderdate": [_day_us(rng, mode) for _ in range(n)],
        "o_orderpriority": [
            _PRIORITIES[0] if ties else str(rng.choice(_PRIORITIES)) for _ in range(n)
        ],
    }
    n = nz["lineitem"]
    t["lineitem"] = {
        "l_orderkey": [int(rng.integers(1, max(nz["orders"], 1) + 2)) for _ in range(n)],
        "l_partkey": [int(rng.integers(1, max(nz["part"], 1) + 2)) for _ in range(n)],
        "l_suppkey": [int(rng.integers(1, max(nz["supplier"], 1) + 2)) for _ in range(n)],
        "l_linenumber": [int(rng.integers(1, 8)) for _ in range(n)],
        "l_quantity": [42.0 if ties else float(rng.integers(1, 51)) for _ in range(n)],
        "l_extendedprice": [42.0 if ties else round(float(rng.uniform(100, 50000)), 2) for _ in range(n)],
        "l_discount": [0.05 if ties else round(float(rng.integers(0, 11)) / 100.0, 2) for _ in range(n)],
        "l_tax": [0.02 if ties else round(float(rng.integers(0, 9)) / 100.0, 2) for _ in range(n)],
        "l_returnflag": [
            _RFLAG[0] if ties else str(rng.choice(_RFLAG)) for _ in range(n)
        ],
        "l_linestatus": [
            _LSTATUS[0] if ties else str(rng.choice(_LSTATUS)) for _ in range(n)
        ],
        "l_shipdate": [_day_us(rng, mode) for _ in range(n)],
    }
    n = nz["events"]
    base_ts = 1704067200 * 1_000_000  # 2024-01-01
    t["events"] = {
        "event_id": list(range(1, n + 1)),
        # ~45-day span (crosses the 2024-01-20 before/after split several
        # registered drift queries use) with seconds-scale intra-day gaps
        # and duplicates: daily series, session boundaries, and ties
        "ts": sorted(
            base_ts
            + (0 if ties else int(rng.integers(0, 45))) * 86_400_000_000
            + (0 if ties else int(rng.integers(0, 4000))) * 1_000_000
            for _ in range(n)
        ),
        "user_id": [int(rng.integers(0, 15)) for _ in range(n)],
        "event_type": [
            _EVENT_TYPES[0] if ties else str(rng.choice(_EVENT_TYPES)) for _ in range(n)
        ],
        "value": [val(0, 200) for _ in range(n)],
        "props": [
            None if nulls else json.dumps({"k": int(rng.integers(0, 100))})
            for _ in range(n)
        ],
    }
    n = nz["documents"]
    texts = [_text(rng, mode) for _ in range(n)]
    # duplicate collisions: every 4th doc repeats an earlier body
    for i in range(3, n, 4):
        texts[i] = texts[i - 3]
    t["documents"] = {
        "doc_id": list(range(1, n + 1)),
        "text": texts,
        "lang": [_LANGS[0] if ties else str(rng.choice(_LANGS)) for _ in range(n)],
        "source": [f"src{int(rng.integers(0, 6))}" for _ in range(n)],
        "n_chars": [len(x) for x in texts],
    }
    n = nz["embeddings"]
    t["embeddings"] = {
        "vec_id": list(range(1, n + 1)),
        "embedding": [
            [0.5] * 64 if ties
            else [round(float(x), 3) for x in rng.normal(size=64)]
            for _ in range(n)
        ],
        "label": [int(rng.integers(0, 10)) for _ in range(n)],
    }
    return t


def _write_sf_dir(path, tables):
    for name in TABLES:
        schema = pq.read_schema(f"{REAL_SF}/{name}.parquet")
        cols = tables[name]
        arrays = []
        for field in schema:
            data = cols[field.name]
            if str(field.type).startswith("timestamp"):
                arr = pa.array(data, type=pa.int64()).cast(field.type)
            else:
                arr = pa.array(data, type=field.type)
            arrays.append(arr)
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=schema),
            f"{path}/{name}.parquet",
        )


@pytest.fixture(scope="module")
def fuzz_dirs(tmp_path_factory):
    dirs = {}
    for mode in SEEDS:
        d = tmp_path_factory.mktemp(f"fuzz_{mode}")
        _write_sf_dir(str(d), _gen_tables(mode))
        dirs[mode] = str(d)
    return dirs


@pytest.fixture(scope="module")
def fuzz_cons(fuzz_dirs):
    import duckdb

    cons = {}
    for mode, d in fuzz_dirs.items():
        con = duckdb.connect()
        for tname in TABLES:
            con.sql(
                f"CREATE VIEW {tname} AS SELECT * FROM '{d}/{tname}.parquet'"
            )
        cons[mode] = con
    yield cons
    for con in cons.values():
        con.close()


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_fuzz_surface_is_registered():
    missing = [q for q in FUZZ_QUERIES if q not in QUERIES or q not in ORACLES]
    assert not missing, missing
    assert len(FUZZ_QUERIES) >= 20 and len(SEEDS) >= 5


@pytest.mark.parametrize("mode", SEEDS)
@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_fuzz_differential(name, mode, spark, fuzz_dirs, fuzz_cons):
    sdf = QUERIES[name](spark, fuzz_dirs[mode])
    spdf = sdf.toPandas()
    # NULL BOOLEAN outputs are a driver-canonicalizer hazard all their
    # own: pandas renders them None (Spark) vs NaN (DuckDB) and the
    # value hash diverges even when the engines agree — name the class
    # directly instead of reporting a generic row mismatch.
    bool_cols = [f.name for f in sdf.schema.fields
                 if f.dataType.typeName() == "boolean"]
    null_bools = [c for c in bool_cols if spdf[c].isna().any()]
    assert not null_bools, (
        f"{name}/{mode}: NULL values in BOOLEAN output columns "
        f"{null_bools} — coalesce to a definite verdict on both sides "
        "(the driver hasher renders None vs NaN differently)"
    )
    s_cols, s_vals = _normalise(spdf)
    d_cols, d_vals = _normalise(fuzz_cons[mode].sql(ORACLES[name]).df())
    assert s_cols == d_cols, f"{name}/{mode}: columns {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}/{mode}: row count {len(s_vals)} vs {len(d_vals)}"
    )
    mism = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
    assert not mism, (
        f"{name}/{mode}: {len(mism)} mismatched rows; first: {mism[:3]}"
    )
