"""Round-13 operator tests: the adaptive NN-descent round schedule
(r12 verdict #1 — the gate is certified in BOTH engines), and the
serve-state graph's n_built staleness contract (r12 verdict #2).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F


def test_knn_descent_rounds_boundaries():
    """rounds = KNN_DESCENT_ROUNDS + ceil_log2(n / base): exact at the
    base, +1 the row past it, +1 per doubling — the same smallest-k
    arithmetic as the SQL gate (n > base·2^(r-6) activates round r)."""
    from kachess_spark.pipeline.similarity import (
        KNN_DESCENT_BASE_N,
        KNN_DESCENT_MAX_UNROLL,
        KNN_DESCENT_ROUNDS,
        knn_descent_rounds,
    )

    assert KNN_DESCENT_BASE_N == 2000
    assert knn_descent_rounds(1) == KNN_DESCENT_ROUNDS
    assert knn_descent_rounds(2000) == KNN_DESCENT_ROUNDS
    assert knn_descent_rounds(2001) == KNN_DESCENT_ROUNDS + 1
    assert knn_descent_rounds(4000) == KNN_DESCENT_ROUNDS + 1
    assert knn_descent_rounds(4001) == KNN_DESCENT_ROUNDS + 2
    assert knn_descent_rounds(16000) == KNN_DESCENT_ROUNDS + 3
    assert knn_descent_rounds(32000) == KNN_DESCENT_ROUNDS + 4
    # the 16x probe setting lands exactly at the SQL twin's unroll cap
    assert knn_descent_rounds(32000) == KNN_DESCENT_MAX_UNROLL
    # base override (the cheap-certification dial used below)
    assert knn_descent_rounds(500, base_n=250) == KNN_DESCENT_ROUNDS + 1
    assert knn_descent_rounds(250, base_n=250) == KNN_DESCENT_ROUNDS


@pytest.mark.slow  # >=20 s measured; excluded from the default gate run (pytest.ini)
def test_descent_adaptive_gate_certified_in_sql(spark, sf_dir, duck):
    """The SQL twin's COUNT(*)-gated unroll must fire an EXTRA round
    when n crosses the base and hash-match the Spark side running that
    same adaptive count — certifying the gating MACHINERY itself, not
    just the all-gates-off fixture branch (which test_oracle_parity
    covers at the default base).  base_n=250 at the n=500 fixture
    activates exactly one gated round (500 > 250; 500 > 500 is false),
    so rounds = 7 on both sides."""
    from kachess_spark.pipeline.similarity import (
        KNN_DESCENT_ROUNDS,
        _sim_knn_graph_descent_oracle,
        knn_descent_rounds,
        sim_knn_graph_descent,
    )
    from tools.check_parity import compare

    n = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).count()
    rounds = knn_descent_rounds(n, base_n=250)
    assert rounds == KNN_DESCENT_ROUNDS + 1  # the gate must fire
    sdf = sim_knn_graph_descent(spark, sf_dir, rounds=rounds).toPandas()
    ddf = (
        duck.execute(_sim_knn_graph_descent_oracle(base_n=250))
        .arrow()
        .to_pandas()
    )
    problems = compare("descent_gated", sdf, ddf)
    assert not problems, problems


def _tiny_corpus(spark, sf_dir, out_dir: str, n: int) -> str:
    """A small embeddings-only corpus dir (first n vectors by id)."""
    os.makedirs(out_dir, exist_ok=True)
    (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .orderBy("vec_id")
        .limit(n)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )
    return out_dir


def test_graph_serve_state_rebuilds_on_corpus_change(spark, sf_dir, tmp_path):
    """r12 verdict weak item: same state path, same params, DIFFERENT
    corpus snapshot must trigger a rebuild — n_built joins the meta
    comparison exactly like the LSH/IVF/PQ/IVFPQ stored states (and
    unchanged corpus still reuses without rewriting)."""
    from kachess_spark.pipeline.similarity import build_graph_serve_state

    a = _tiny_corpus(spark, sf_dir, str(tmp_path / "corpus_a"), 60)
    b = _tiny_corpus(spark, sf_dir, str(tmp_path / "corpus_b"), 40)
    st = str(tmp_path / "gserve")

    d1 = build_graph_serve_state(spark, a, state_dir=st)
    meta1 = spark.read.parquet(os.path.join(d1, "meta")).head().asDict()
    assert meta1["n_built"] == 60

    # same corpus -> reuse (meta untouched)
    mtimes = {
        f: os.path.getmtime(os.path.join(d1, "meta", f))
        for f in os.listdir(os.path.join(d1, "meta"))
    }
    d2 = build_graph_serve_state(spark, a, state_dir=st)
    assert d2 == d1
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(d2, "meta", f)) == m

    # different snapshot at the SAME path -> rebuild, not stale serve
    d3 = build_graph_serve_state(spark, b, state_dir=st)
    meta3 = spark.read.parquet(os.path.join(d3, "meta")).head().asDict()
    assert meta3["n_built"] == 40
    srcs = {
        r["src"]
        for r in spark.read.parquet(os.path.join(d3, "graph"))
        .select("src")
        .distinct()
        .collect()
    }
    b_ids = {
        r["vec_id"]
        for r in spark.read.parquet(
            os.path.join(b, "embeddings.parquet")
        ).collect()
    }
    assert srcs <= b_ids  # graph really is over corpus B now


# ---------------- serve-graph incremental maintenance (verdict #3)


def _v2_truth(spark, sf_dir, k):
    """numpy brute-force top-k truth over the v2 snapshot corpus."""
    import numpy as np

    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline.similarity import knn_snapshot_v2

    emb = Tables(spark, sf_dir).embeddings.select("vec_id", "embedding")
    rows = knn_snapshot_v2(emb).collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = np.round(mn @ mn.T, 6)
    np.fill_diagonal(s, -np.inf)
    truth = {}
    for i in range(len(ids)):
        order = sorted(
            range(len(ids)), key=lambda j: (-s[i][j], ids[j])
        )[:k]
        truth[int(ids[i])] = {int(ids[j]) for j in order}
    return truth


def test_serve_incremental_invariants_and_recall(spark, sf_dir):
    """The maintained v2 graph: every source/destination is a v2
    member, ranks are a contiguous 1..k prefix, and recall@KNN_K vs
    brute-force v2 truth is at the measured level (0.994 at sf0.001 —
    ABOVE the 0.9873 from-scratch rebuild, because maintenance starts
    from the converged v1 graph; floor set with margin)."""
    from kachess_spark.pipeline.similarity import (
        KNN_K,
        sim_graph_serve_incremental,
    )

    truth = _v2_truth(spark, sf_dir, KNN_K)
    got_rows = sim_graph_serve_incremental(spark, sf_dir).collect()
    by_src: dict[int, list] = {}
    got: dict[int, set] = {}
    for r in got_rows:
        assert r["src"] in truth and r["dst"] in truth
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], []).append(r["rk"])
        got.setdefault(r["src"], set()).add(r["dst"])
    for v, rks in by_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= KNN_K
    recall = sum(
        len(got.get(v, set()) & t) for v, t in truth.items()
    ) / (len(truth) * KNN_K)
    assert recall >= 0.95, recall


def test_update_graph_serve_state_serves_maintained_graph(
    spark, sf_dir, tmp_path
):
    """build -> maintain -> persist -> SERVE: the updated state carries
    the v2 n_built, and the beam-search serving leg reads it against
    the materialized v2 corpus (probe id 3 is dropped by the snapshot
    residues, so only queries 1 and 2 return)."""
    from kachess_spark.catalog import Tables
    from kachess_spark.pipeline.similarity import (
        TOP_K,
        knn_snapshot_v2,
        sim_graph_stored_topk,
        update_graph_serve_state,
    )

    emb = Tables(spark, sf_dir).embeddings.select("vec_id", "embedding")
    v2 = knn_snapshot_v2(emb)
    n2 = v2.count()
    v2_dir = str(tmp_path / "v2_corpus")
    os.makedirs(v2_dir, exist_ok=True)
    v2.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(v2_dir, "embeddings.parquet")
    )

    out = update_graph_serve_state(spark, sf_dir)
    meta = spark.read.parquet(os.path.join(out, "meta")).head().asDict()
    assert meta["n_built"] == n2
    served = sim_graph_stored_topk(
        spark, v2_dir, state_dir=out
    ).collect()
    qids = {r["qid"] for r in served}
    assert qids == {1, 2}  # id 3 is dropped in v2
    for q in qids:
        rks = sorted(r["rk"] for r in served if r["qid"] == q)
        assert rks == list(range(1, TOP_K + 1))
