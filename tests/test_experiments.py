"""Experiment harnesses (H1/H2/H7) + permutation-map sink (S13)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_msmarco_spark.operators.correlation import kendall_tau
from lucene_msmarco_spark.operators.experiments import (
    grid_search_lambda,
    qpp_experiment,
    stochastic_qpp_evaluation,
)
from lucene_msmarco_spark.operators.index import assign_doc_ids, build_index
from lucene_msmarco_spark.operators.retrieval import search
from lucene_msmarco_spark.sources.transcripts import transcripts_local
from lucene_msmarco_spark.sources.writers import permutation_map

QUERIES = [
    ("q1", "ricufex kekegra report"),
    ("q2", "zedzedwi rigrasto bicubi cugramo"),
    ("q3", "tamori polgrake verlu"),
    ("q4", "yacuv biripol stove"),
]


@pytest.fixture(scope="module")
def ctx(spark):
    pdf = transcripts_local(300, seed=42)
    docs = assign_doc_ids(spark.createDataFrame(pdf), ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english")
    qdf = spark.createDataFrame(QUERIES, "qid string, qtext string")
    # deterministic synthetic qrels: doc_id % 7 keyed by query index
    rows = []
    for qi, (qid, _) in enumerate(QUERIES):
        for d in range(0, 300, 7 + qi):
            rows.append((qid, d, 1 + (d + qi) % 3))
    qrels = spark.createDataFrame(rows, "qid string, doc_id long, rel int")
    return idx, qdf, qrels


def test_qpp_experiment_shapes(ctx):
    idx, qdf, qrels = ctx
    res = qpp_experiment(idx, qdf, qrels, model="bm25", predictor="nqc",
                         k=50, qpp_k=20)
    assert len(res["qids"]) >= 3
    assert set(res["correlations"]) == {
        "kendall", "pearson", "spearman", "sare"
    }
    assert -1 <= res["correlations"]["kendall"] <= 1
    # per-query metric + estimate vectors align with qids
    assert len(res["gt"]) == len(res["pred"]) == len(res["qids"])


def test_qpp_experiment_all_predictors(ctx):
    idx, qdf, qrels = ctx
    for pred in ("nqc", "cumnqc", "avgidf", "maxidf"):
        res = qpp_experiment(idx, qdf, qrels, model="bm25",
                             predictor=pred, k=30, qpp_k=10)
        assert np.isfinite(res["pred"]).all()


def test_grid_search_lambda(spark, ctx):
    idx, qdf, qrels = ctx
    res = qpp_experiment(idx, qdf, qrels, model="bm25", predictor="nqc",
                         k=50, qpp_k=20)
    base = res["estimates"]
    # variants: jittered copies of the base estimate
    variant = base.select(
        "qid", F.lit(1.0).alias("sim"),
        (F.col("nqc") * 1.1).alias("est"),
    )
    out = grid_search_lambda(base, "nqc", variant, res["metrics"])
    assert 0.0 <= out["best_lambda"] <= 1.0
    assert len(out["taus"]) == 11
    # scaled variant preserves ranking -> all lambdas give the same tau
    vals = [v for v in out["taus"].values() if np.isfinite(v)]
    assert max(vals) - min(vals) < 1e-9


def test_stochastic_qpp_evaluation(ctx):
    idx, qdf, qrels = ctx
    run = search(idx, qdf, model="bm25", k=30).cache()
    res = stochastic_qpp_evaluation(
        idx, qdf, qrels, run, num_samples=4, seed=7
    )
    assert set(res) == {"base_tau", "sample_taus", "mean_tau", "delta_tau"}
    assert len(res["sample_taus"]) == 4
    # deterministic under the same seed
    res2 = stochastic_qpp_evaluation(
        idx, qdf, qrels, run, num_samples=4, seed=7
    )
    assert res["sample_taus"] == res2["sample_taus"]


def test_kendall_tau_perfect():
    assert kendall_tau([1, 2, 3, 4], [10, 20, 30, 40]) == pytest.approx(1.0)
    assert kendall_tau([1, 2, 3, 4], [40, 30, 20, 10]) == pytest.approx(-1.0)


def test_permutation_map(spark):
    pre = spark.createDataFrame(
        [("q1", 10, 1, 3.0), ("q1", 20, 2, 2.0), ("q1", 30, 3, 1.0)],
        "qid string, doc_id long, rank int, score double",
    )
    post = spark.createDataFrame(
        [("q1", 30, 1, 3.0), ("q1", 10, 2, 2.0), ("q1", 20, 3, 1.0)],
        "qid string, doc_id long, rank int, score double",
    )
    line = permutation_map(pre, post).collect()[0]["line"]
    assert line == "q1\t1>2,2>3,3>1"


def test_shuffled_runs_single_doc_query(spark):
    """ADVICE r1: a query whose list has exactly one doc must not crash
    the shuffle sampler (no swap partner exists -> identity list)."""
    from lucene_msmarco_spark.operators.stochastic import shuffled_runs

    run = spark.createDataFrame(
        [("q1", 7, 1, 3.0, 1), ("q2", 1, 1, 9.0, 0), ("q2", 2, 2, 8.0, 1)],
        "qid string, doc_id long, rank int, score double, rel int",
    )
    out = shuffled_runs(run, num_samples=2, num_shuffles=5).collect()
    q1 = [r for r in out if r.qid == "q1"]
    assert len(q1) == 2 and all(r.doc_id == 7 for r in q1)


def test_composite_qid_rejects_hash(spark):
    """ADVICE r1: a real qid containing the reserved '#' delimiter must
    fail fast, not silently mis-group per-sample correlations."""
    import pytest
    from lucene_msmarco_spark.operators.qpp import composite_qid

    df = spark.createDataFrame(
        [("q#1", 0)], "qid string, sample int"
    ).select(composite_qid().alias("k"))
    with pytest.raises(Exception, match="reserved delimiter"):
        df.collect()


# ---------------------------------------------------------------------------
# H4 — settings loader (experiments/SettingsLoader.java:29-81)
# ---------------------------------------------------------------------------


def test_parse_properties_line_format():
    from lucene_msmarco_spark.config import parse_properties

    text = (
        "# comment\n"
        "! also a comment\n"
        "   \n"
        "a=1\n"
        "b : two\n"
        "c three\n"          # whitespace separator
        "d=trailing \\\n"    # line continuation
        "   joined\n"
        "e\\=x=has escaped eq\n"
        "f=tab\\there\\n\\u0041\n"
        "dup=first\n"
        "dup=second\n"
        "empty=\n"
        "keyonly\n"
    )
    p = parse_properties(text)
    assert p["a"] == "1"
    assert p["b"] == "two"
    assert p["c"] == "three"
    assert p["d"] == "trailing joined"
    assert p["e=x"] == "has escaped eq"
    assert p["f"] == "tab\there\nA"
    assert p["dup"] == "second"       # Hashtable.put: last wins
    assert p["empty"] == ""
    assert p["keyonly"] == ""
    assert "# comment" not in p


def test_parse_properties_even_backslashes_not_continuation():
    from lucene_msmarco_spark.config import parse_properties

    # "\\\\" = escaped backslash, NOT a continuation
    p = parse_properties("a=x\\\\\nb=y")
    assert p["a"] == "x\\" and p["b"] == "y"
    # odd trailing backslash at EOF: dropped
    assert parse_properties("a=x\\")["a"] == "x"


def test_settings_defaults_and_resolution(tmp_path):
    from lucene_msmarco_spark.config import Settings, load_settings

    s = Settings.from_text(
        "index.dir=/idx\nqpp.numtopdocs=50\nqpp.metric=tau\n"
        "qpp.method=nqc\n"
    )
    assert s.index_dir == "/idx"
    assert s.num_wanted == 1000      # retrieve.num_wanted default
    assert s.qsim_intervals == 5     # qsim.numintervals default
    assert s.qpp_top_k == 50 and s.qpp_metric == "tau"
    assert s.get("missing", "dflt") == "dflt"
    # no qpp.numtopdocs -> None (the reference NPEs; we surface None)
    assert Settings.from_text("index.dir=/idx").qpp_top_k is None

    f = tmp_path / "init.properties"
    f.write_text("retrieve.num_wanted=25\nqpp.numtopdocs=10\n")
    s2 = load_settings(str(f))
    assert s2.num_wanted == 25
    assert s2.engine_config().num_wanted == 25


def test_correlation_metric_map():
    from lucene_msmarco_spark.operators.experiments import (
        correlation_metric,
    )
    from lucene_msmarco_spark.operators.correlation import (
        pairwise_accuracy, quantized_sim,
    )

    gt = np.array([0.1, 0.4, 0.2, 0.9])
    pred = np.array([1.0, 3.0, 2.0, 4.0])
    assert correlation_metric("tau")(gt, pred) == pytest.approx(
        kendall_tau(gt, pred))
    assert correlation_metric("pairacc")(gt, pred) == pytest.approx(
        pairwise_accuracy(gt, pred))
    # qsim binds n_intervals (qsim.numintervals)
    assert correlation_metric("qsim", 3)(gt, pred) == pytest.approx(
        quantized_sim(gt, pred, 3))
    with pytest.raises(KeyError):
        correlation_metric("nope")


def test_qpp_estimates_dispatch(ctx):
    from lucene_msmarco_spark.operators.experiments import qpp_estimates
    from lucene_msmarco_spark.operators.qpp import (
        nqc, query_idf_stats,
    )
    from lucene_msmarco_spark.operators.retrieval import compile_queries

    idx, qdf, _ = ctx
    qterms = compile_queries(qdf).cache()
    run = search(idx, qdf, model="bm25", k=50,
                 precompiled_terms=qterms).cache()

    stats = query_idf_stats(qterms, idx.term_stats, idx.stats.n_docs)
    want_avgidf = {r.qid: r.avgidf for r in stats.collect()}
    got = {r.qid: r.est
           for r in qpp_estimates("avgidf", idx, run, qterms).collect()}
    assert got == pytest.approx(want_avgidf)

    want_nqc = {r.qid: r.nqc for r in nqc(run, stats, k=20).collect()}
    got = {r.qid: r.est
           for r in qpp_estimates("nqc", idx, run, qterms,
                                  top_k=20).collect()}
    assert got == pytest.approx(want_nqc)

    out = qpp_estimates("uef_nqc", idx, run, qterms, top_k=20)
    assert out.columns == ["qid", "est"]
    vals = {r.qid: r.est for r in out.collect()}
    assert len(vals) == 4 and all(np.isfinite(v) for v in vals.values())

    with pytest.raises(KeyError):
        qpp_estimates("nope", idx, run, qterms)


def test_stochastic_swappers_string_doc_ids(spark):
    """The H5/H6 swap kernels are type-generic; the declared output
    schemas must follow the input run's doc_id type so string-id runs
    (read_res on real TREC files) pass through unchanged."""
    from lucene_msmarco_spark.operators.stochastic import (
        sample_swapped_runs,
        shuffled_runs,
        swap_permutations,
    )

    run = spark.createDataFrame(
        [("q1", f"D{i}", i + 1, 10.0 - i, 1 if i == 0 else 0)
         for i in range(4)],
        "qid string, doc_id string, rank int, score double, rel int",
    )
    perms = swap_permutations(run).toPandas()
    assert perms["doc_id"].map(lambda d: isinstance(d, str)).all()
    # identity perm 0 preserves the original order
    p0 = perms[perms["perm_id"] == 0].sort_values("rank")
    assert p0["doc_id"].tolist() == [f"D{i}" for i in range(4)]
    for fn in (
        lambda: sample_swapped_runs(run, num_samples=2),
        lambda: sample_swapped_runs(run, num_samples=2, permute="md5"),
        lambda: shuffled_runs(run, num_samples=2, num_shuffles=3),
    ):
        out = fn().toPandas()
        assert out["doc_id"].map(lambda d: isinstance(d, str)).all()
        assert set(out["doc_id"]) == {f"D{i}" for i in range(4)}
