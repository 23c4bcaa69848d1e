"""Wave 86: fixed-round k-core peel and event trigram paths — closed-form
graph goldens (clique + pendant chain), convergence, determinism."""

from __future__ import annotations

from hmpps_digital_prison_reporting_glue_poc_spark.operators.behavior import (
    event_path_trigrams,
)
from hmpps_digital_prison_reporting_glue_poc_spark.operators.graph import kcore_peel

# A K5 clique (every vertex degree 4) with a pendant chain c1-c2-c3 hanging
# off one clique vertex, plus a separate triangle t1-t2-t3 (degree 2 each).
CLIQUE = ["k1", "k2", "k3", "k4", "k5"]
EDGES = (
    [(a, b) for i, a in enumerate(CLIQUE) for b in CLIQUE[i + 1 :]]
    + [("c1", "k1"), ("c1", "c2"), ("c2", "c3")]
    + [("t1", "t2"), ("t1", "t3"), ("t2", "t3")]
)


def _edges_df(spark):
    canon = [(min(a, b), max(a, b)) for a, b in EDGES]
    return spark.createDataFrame(canon, "a string, b string")


def test_kcore_3_keeps_clique_drops_chain_keeps_nothing_else_at_4(spark):
    # k=3: K5 survives (deg 4), chain peels away (c3 deg 1 -> c2 -> c1),
    # triangle has degree 2 < 3 so it peels in round 1.
    out = {
        r.vertex: r.degree for r in kcore_peel(_edges_df(spark), k=3).collect()
    }
    assert set(out) == set(CLIQUE)
    assert all(d == 4 for d in out.values())


def test_kcore_2_keeps_triangle_and_clique(spark):
    out = {
        r.vertex: r.degree for r in kcore_peel(_edges_df(spark), k=2).collect()
    }
    # chain peels (c3 deg1, then c2, then c1); triangle + clique survive
    assert set(out) == set(CLIQUE) | {"t1", "t2", "t3"}
    assert out["t1"] == 2 and out["k2"] == 4
    # k1 loses its pendant edge to c1 but keeps its 4 clique edges
    assert out["k1"] == 4


def test_kcore_insufficient_rounds_leaves_residue_visible(spark):
    # one round peels only c3; c2 still present with degree 1 < 2 —
    # the fixed-round contract EXPOSES non-convergence instead of hiding it
    out = {
        r.vertex: r.degree
        for r in kcore_peel(_edges_df(spark), k=2, rounds=1).collect()
    }
    assert "c3" not in out
    assert out.get("c2") == 1  # visible residue below k


def test_kcore_partition_independent(spark):
    a = kcore_peel(_edges_df(spark), k=3).collect()
    b = kcore_peel(_edges_df(spark).repartition(7), k=3).collect()
    assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_trigram_paths_golden(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: v c p v c p  -> trigrams: vcp, cpv, pvc, vcp
    for i, t in enumerate("vcpvcp"):
        rows.append((eid, t0 + datetime.timedelta(minutes=i), 1, t))
        eid += 1
    # user 2: v v  -> too short for any trigram
    for i, t in enumerate("vv"):
        rows.append((eid, t0 + datetime.timedelta(minutes=i), 2, t))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.t1, r.t2, r.t3): r.n_paths
        for r in event_path_trigrams(df).collect()
    }
    assert got == {
        ("v", "c", "p"): 2,
        ("c", "p", "v"): 1,
        ("p", "v", "c"): 1,
    }
