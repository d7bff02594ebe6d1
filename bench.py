#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling protocol).

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", ...}``.

``--scaling`` mode — the sandbox protocol for the north rule's "N vs 4N
executors, efficiency >= 0.8" criterion: the SAME two jobs (inverted-index
build; batch BM25 top-100 search) run over the SAME pre-generated parquet
input at two parallelism levels (default local[8] and local[32]; override
with LMS_SCALING_SMALL/LMS_SCALING_BIG), each in its own JVM. Efficiency
= (rate_big / rate_small) / (big/small). Results appended to
BENCH/BASELINE.md.

Design notes for honest scaling measurement:
- the input is on-disk parquet generated ONCE (generation is Python-heavy
  and not part of the engine's work);
- each timed phase starts after a warm-up that exercises the same plan
  shapes (JIT/codegen/Arrow Python-worker startup are one-time session
  costs a long-running cluster would have amortized);
- timed work is dominated by wide parallel stages (tokenize+aggregate;
  postings-join scoring) rather than driver-side collects.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BENCH_TURNS = int(os.environ.get("LMS_BENCH_TURNS", "200000"))
N_SCALING_TURNS = int(os.environ.get("LMS_SCALING_TURNS", "600000"))
N_BENCH_QUERIES = int(os.environ.get("LMS_BENCH_QUERIES", "512"))
SCALING_SMALL = int(os.environ.get("LMS_SCALING_SMALL", "8"))
SCALING_BIG = int(os.environ.get("LMS_SCALING_BIG", "32"))
SCRATCH = os.path.join(REPO, ".scratch")


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def _input_path(n_turns: int) -> str:
    return os.path.join(SCRATCH, f"bench_input_{n_turns}")


def ensure_input(n_turns: int) -> str:
    """Generate the deterministic transcript corpus once, on disk."""
    path = _input_path(n_turns)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from lucene_msmarco_spark.session import build_session
    from lucene_msmarco_spark.sources.transcripts import generate_transcripts

    spark = build_session(app_name="lms-bench-gen", master="local[32]",
                          shuffle_partitions=32)
    tr = generate_transcripts(spark, n_turns=n_turns, seed=42,
                              num_partitions=128)
    tr.write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def _query_set(n: int) -> list[tuple[str, str]]:
    """Deterministic 3-term queries drawn from the synthetic Zipf vocab
    (no dependence on the built index)."""
    import numpy as np

    from lucene_msmarco_spark.sources.transcripts import _vocab

    vocab = _vocab(42)
    rng = np.random.default_rng(20260817)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    rows = []
    for i in range(n):
        idxs = np.searchsorted(cdf, rng.random(3))
        rows.append((f"q{i}", " ".join(vocab[j] for j in idxs)))
    return rows


def _bench_engine(spark, input_path: str, n_queries: int,
                  timings: dict) -> dict:
    from lucene_msmarco_spark.operators.index import (
        assign_doc_ids,
        build_index,
    )
    from lucene_msmarco_spark.operators.retrieval import search
    from lucene_msmarco_spark.sources.transcripts import generate_transcripts

    # ---- warm-up: same plan shapes on a small slice --------------------
    wtr = generate_transcripts(spark, n_turns=4000, seed=7)
    wdocs = assign_doc_ids(wtr, ["conv_id", "turn_idx"])
    widx = build_index(wdocs, analyzer="english", cache=True)
    wq = spark.createDataFrame(
        _query_set(8), "qid string, qtext string"
    )
    search(widx, wq, model="bm25", k=10, strategy="two_phase").count()
    widx.tokens.unpersist()

    n_turns = int(input_path.rsplit("_", 1)[-1])

    # ---- timed job 1: inverted-index build -----------------------------
    t0 = time.time()
    tr = spark.read.parquet(input_path)
    docs = assign_doc_ids(tr, ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english", cache=True)
    idx.tokens.count()          # materialize postings-level artifact
    index_sec = time.time() - t0
    timings["index_build"] = round(index_sec, 3)

    # ---- timed job 2: batch top-k search -------------------------------
    qdf = spark.createDataFrame(
        _query_set(n_queries), "qid string, qtext string"
    )
    t0 = time.time()
    search(idx, qdf, model="bm25", k=100, strategy="two_phase").count()
    query_sec = time.time() - t0
    timings["batch_search"] = round(query_sec, 3)

    return {
        "index_turns_per_sec": round(n_turns / index_sec, 1),
        "queries_per_sec": round(n_queries / query_sec, 1),
    }


def run_bench(master: str, input_path: str | None = None,
              with_sf_queries: bool = True) -> dict:
    from lucene_msmarco_spark import entry_queries
    from lucene_msmarco_spark.session import build_session

    if input_path is None:
        input_path = ensure_input(N_BENCH_TURNS)

    spark = build_session(app_name="lms-bench", master=master)
    timings: dict[str, float] = {}
    t_all = time.time()

    if with_sf_queries:
        for name in ("bm25_topk", "eval_metrics", "dedup_minhash_lsh",
                     "ann_cosine_topk", "text_quality"):
            q = entry_queries.make_spark_query(name)
            t0 = time.time()
            q(spark, SF_DIR).count()
            timings[name] = round(time.time() - t0, 3)

    throughput = _bench_engine(spark, input_path, N_BENCH_QUERIES, timings)

    total = round(time.time() - t_all, 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "master": master,
        "n_turns": int(input_path.rsplit("_", 1)[-1]),
        "throughput": throughput,
    }
    spark.stop()
    return out


def scaling() -> None:
    input_path = ensure_input(N_SCALING_TURNS)
    results = {}
    for n in (SCALING_SMALL, SCALING_BIG):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        p = subprocess.run(
            [sys.executable, __file__, "--master", f"local[{n}]",
             "--input", input_path, "--engine-only"],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            sys.stderr.write(p.stdout + "\n" + p.stderr)
            raise SystemExit("scaling subprocess produced no JSON")
        results[n] = json.loads(lines[-1])
    r_s, r_b = results[SCALING_SMALL], results[SCALING_BIG]
    factor = SCALING_BIG / SCALING_SMALL
    eff_idx = (
        r_b["throughput"]["index_turns_per_sec"]
        / r_s["throughput"]["index_turns_per_sec"] / factor
    )
    eff_q = (
        r_b["throughput"]["queries_per_sec"]
        / r_s["throughput"]["queries_per_sec"] / factor
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run ({N_SCALING_TURNS} turns, "
            f"{N_BENCH_QUERIES} queries, same parquet input, "
            f"local[{SCALING_SMALL}] vs local[{SCALING_BIG}])\n\n"
            "| parallelism | index turns/sec | queries/sec |\n"
            "|---|---|---|\n"
            f"| local[{SCALING_SMALL}] | "
            f"{r_s['throughput']['index_turns_per_sec']} | "
            f"{r_s['throughput']['queries_per_sec']} |\n"
            f"| local[{SCALING_BIG}] | "
            f"{r_b['throughput']['index_turns_per_sec']} | "
            f"{r_b['throughput']['queries_per_sec']} |\n\n"
            f"- scaling efficiency (index build, (rate_big/rate_small)/"
            f"{factor:.0f}): **{eff_idx:.3f}**\n"
            f"- scaling efficiency (batch query): **{eff_q:.3f}**\n"
        )
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(min(eff_idx, eff_q), 3),
        "unit": "ratio",
        "index_efficiency": round(eff_idx, 3),
        "query_efficiency": round(eff_q, 3),
        f"local{SCALING_SMALL}": r_s["throughput"],
        f"local{SCALING_BIG}": r_b["throughput"],
    }))


def main() -> None:
    args = sys.argv[1:]
    if "--scaling" in args:
        scaling()
        return
    master = f"local[{CPUS}]"
    if "--master" in args:
        master = args[args.index("--master") + 1]
    input_path = None
    if "--input" in args:
        input_path = args[args.index("--input") + 1]
    with_sf = "--engine-only" not in args
    print(json.dumps(run_bench(master, input_path, with_sf)))


if __name__ == "__main__":
    main()
