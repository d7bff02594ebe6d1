#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling protocol).

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", ...}``.

``--scaling`` mode: runs the same jobs at local[8] and local[32] on
identical input (each in its own subprocess/JVM) and appends throughput +
scaling efficiency to BENCH/BASELINE.md (sandbox protocol for the north
rule's N vs 4N executors criterion).
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
N_BENCH_TURNS = int(os.environ.get("LMS_BENCH_TURNS", "100000"))
N_BENCH_QUERIES = int(os.environ.get("LMS_BENCH_QUERIES", "200"))


def _sf_label(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def run_bench(master: str) -> dict:
    from pyspark.sql import functions as F

    from lucene_msmarco_spark import entry_queries
    from lucene_msmarco_spark.operators.index import (
        assign_doc_ids,
        build_index,
    )
    from lucene_msmarco_spark.operators.retrieval import search
    from lucene_msmarco_spark.session import build_session
    from lucene_msmarco_spark.sources.transcripts import generate_transcripts

    spark = build_session(app_name="lms-bench", master=master)
    timings: dict[str, float] = {}

    # Warm-up: run the same plan shapes on a small slice first so JIT
    # compilation / codegen / shuffle-service setup don't pollute the
    # timed runs (observed 10-30s first-stage warmup on this JVM).
    wtr = generate_transcripts(spark, n_turns=max(2000, N_BENCH_TURNS // 50),
                               seed=7)
    wdocs = assign_doc_ids(wtr, ["conv_id", "turn_idx"])
    widx = build_index(wdocs, analyzer="english", cache=True)
    wq = spark.createDataFrame([("w1", "warm up run")],
                               "qid string, qtext string")
    search(widx, wq, model="bm25", k=10, strategy="two_phase").count()

    t_all = time.time()

    # --- sf-table operator queries (shared SQL path) ---------------------
    for name in ("bm25_topk", "eval_metrics", "dedup_minhash_lsh",
                 "ann_cosine_topk", "text_quality"):
        q = entry_queries.make_spark_query(name)
        t0 = time.time()
        q(spark, SF_DIR).count()  # materialize
        timings[name] = round(time.time() - t0, 3)

    # --- engine path on synthetic transcripts ----------------------------
    t0 = time.time()
    tr = generate_transcripts(spark, n_turns=N_BENCH_TURNS, seed=42)
    docs = assign_doc_ids(tr, ["conv_id", "turn_idx"])
    idx = build_index(docs, analyzer="english", cache=True)
    # force full materialization of the index artifacts
    idx.tokens.count()
    idx.term_stats.count()
    index_sec = time.time() - t0
    timings["index_build"] = round(index_sec, 3)

    # batch query set drawn from hot corpus terms (deterministic)
    top_terms = [
        r["term"]
        for r in idx.term_stats.orderBy(F.desc("df"), "term")
        .limit(3 * N_BENCH_QUERIES).collect()
    ]
    qrows = [
        (f"q{i}", " ".join(top_terms[3 * i : 3 * i + 3]))
        for i in range(N_BENCH_QUERIES)
    ]
    qdf = spark.createDataFrame(qrows, "qid string, qtext string")
    t0 = time.time()
    search(idx, qdf, model="bm25", k=100, strategy="two_phase").count()
    query_sec = time.time() - t0
    timings["batch_search"] = round(query_sec, 3)

    total = round(time.time() - t_all, 3)
    out = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "master": master,
        "throughput": {
            "index_turns_per_sec": round(N_BENCH_TURNS / index_sec, 1),
            "queries_per_sec": round(N_BENCH_QUERIES / query_sec, 1),
        },
    }
    spark.stop()
    return out


def scaling() -> None:
    results = {}
    for n in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        p = subprocess.run(
            [sys.executable, __file__, "--master", f"local[{n}]"],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n] = json.loads(line)
    r8, r32 = results[8], results[32]
    eff_idx = (
        r32["throughput"]["index_turns_per_sec"]
        / r8["throughput"]["index_turns_per_sec"] / 4
    )
    eff_q = (
        r32["throughput"]["queries_per_sec"]
        / r8["throughput"]["queries_per_sec"] / 4
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run ({N_BENCH_TURNS} turns, {N_BENCH_QUERIES} "
            f"queries, sf-dir {SF_DIR})\n\n"
            "| parallelism | index turns/sec | queries/sec |\n"
            "|---|---|---|\n"
            f"| local[8] | {r8['throughput']['index_turns_per_sec']} | "
            f"{r8['throughput']['queries_per_sec']} |\n"
            f"| local[32] | {r32['throughput']['index_turns_per_sec']} | "
            f"{r32['throughput']['queries_per_sec']} |\n\n"
            f"- scaling efficiency (index build, (rate32/rate8)/4): "
            f"**{eff_idx:.3f}**\n"
            f"- scaling efficiency (batch query): **{eff_q:.3f}**\n"
        )
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(min(eff_idx, eff_q), 3),
        "unit": "ratio",
        "index_efficiency": round(eff_idx, 3),
        "query_efficiency": round(eff_q, 3),
        "local8": r8["throughput"],
        "local32": r32["throughput"],
    }))


def main() -> None:
    args = sys.argv[1:]
    if "--scaling" in args:
        scaling()
        return
    master = f"local[{CPUS}]"
    if "--master" in args:
        master = args[args.index("--master") + 1]
    print(json.dumps(run_bench(master)))


if __name__ == "__main__":
    main()
