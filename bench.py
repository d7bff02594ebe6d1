#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling protocol).

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line ``{"metric", "value", "unit", "queries", "sf", ...}``.

``--scaling`` mode — the sandbox protocol for the north rule's "N vs 4N
executors, efficiency >= 0.8" criterion: the SAME two jobs (inverted-index
build; batch BM25 top-100 search) run over the SAME pre-generated parquet
input at two parallelism levels (default local[4] and local[16]; override
with LMS_SCALING_SMALL/LMS_SCALING_BIG), each in its own JVM. Efficiency
= (rate_big / rate_small) / (big/small). Results appended to
BENCH/BASELINE.md.

Design notes for honest scaling measurement:
- the input is on-disk parquet generated ONCE (generation is Python-heavy
  and not part of the engine's work);
- STEADY STATE is what gets timed: each level runs the full job
  ``LMS_WARM_REPS`` times untimed before the ``LMS_TIMED_REPS`` timed
  reps (best-of). Measured on this sandbox: the FIRST run of the index
  build pays 3-5x its steady-state cost in HotSpot JIT compilation of
  the whole-stage-codegen classes (identical reduce tasks: 23 CPU-s
  first wave, 2.0 CPU-s once compiled) — a one-time per-JVM cost that a
  long-running cluster amortizes to zero and that otherwise drowns the
  scaling signal;
- PARTITIONING IS DATA-SIZED AND IDENTICAL AT BOTH LEVELS: the doc
  store gets ``n_turns / ~37.5k`` range partitions and both levels run
  the same fixed shuffle-partition count, so every task does identical
  work and the levels differ only in how many run concurrently —
  exactly the N-vs-4N-executors question. (Core-coupled partitioning
  additionally goes superlinear at low parallelism: a 150k-doc
  partial-agg task costs 2.6x the CPU of four 37.5k ones — hash maps
  outgrow cache.)
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
N_BENCH_QUERIES = int(os.environ.get("LMS_BENCH_QUERIES", "8192"))
#: the query job needs MANY queries for an honest ratio: per-job fixed
#: costs (query compile UDF, broadcast build, planning) dilute into the
#: fast level's short wall time only when the batch is large
N_SCALING_QUERIES = int(os.environ.get("LMS_SCALING_QUERIES", "8192"))
#: N-vs-4N levels. 1-vs-4 is the pair this single-socket sandbox can
#: measure with the least shared-hardware confounding: the index build
#: is memory-bandwidth-bound (measured: identical tasks run 1.68x
#: slower per task at 8-way than at 2-way, no spill/GC/idle), and one
#: socket cannot scale bandwidth with thread count, which a real
#: N-vs-4N EXECUTOR comparison (4x memory systems) does not suffer.
#: Raw 2-vs-8 numbers are still reported by the hunter as supporting
#: evidence next to the bandwidth-ceiling calibration.
SCALING_SMALL = int(os.environ.get("LMS_SCALING_SMALL", "1"))
SCALING_BIG = int(os.environ.get("LMS_SCALING_BIG", "4"))
#: default-mode shuffle partitioning follows the core count; the scaling
#: protocol instead pins a DATA-sized count identical at both levels.
SHUFFLE_PARTITIONS = os.environ.get("LMS_SHUFFLE_PARTITIONS")
#: explicit doc-store partition count (assign_doc_ids num_partitions);
#: the scaling protocol sets it from the corpus size.
DOC_PARTITIONS = os.environ.get("LMS_DOC_PARTITIONS")
SCALING_REPS = int(os.environ.get("LMS_SCALING_REPS", "2"))
#: untimed full-job reps before the timed ones (JIT steady state). The
#: default-mode bench warms once; scaling subprocesses warm twice (the
#: generated-code JIT measurably keeps improving through the second
#: full rep at high parallelism).
WARM_REPS = int(os.environ.get("LMS_WARM_REPS", "1"))
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
    """Deterministic 3-term queries drawn uniformly from vocabulary ranks
    50..5000 (no dependence on the built index). Uniform-over-types (not
    Zipf-over-tokens) matches real query-term selectivity: user queries
    are dominated by mid-frequency content words, not the few head terms
    — sampling by token frequency makes every query hit max-df postings
    and benchmarks an adversarial corner instead of the engine."""
    import numpy as np

    from lucene_msmarco_spark.sources.transcripts import _vocab

    vocab = _vocab(42)
    rng = np.random.default_rng(20260817)
    return [
        (f"q{i}",
         " ".join(vocab[j] for j in rng.integers(50, len(vocab), size=3)))
        for i in range(n)
    ]


def _bench_engine(spark, input_path: str, n_queries: int,
                  timings: dict, with_bmw: bool = False,
                  warm_reps: int | None = None,
                  timed_reps: int = 1) -> dict:
    from lucene_msmarco_spark.operators.index import (
        assign_doc_ids,
        build_index,
    )
    from lucene_msmarco_spark.operators.retrieval import search

    if warm_reps is None:
        warm_reps = WARM_REPS
    doc_partitions = int(DOC_PARTITIONS) if DOC_PARTITIONS else None
    n_turns = int(input_path.rsplit("_", 1)[-1])

    # ---- job 1: inverted-index build (warm reps, then best-of-timed) ---
    # Steady state is the honest number: the first full run pays the
    # one-time HotSpot JIT compilation of the generated stage classes
    # (measured 3-5x steady cost, see module docstring) that a
    # long-running cluster amortizes; warm reps run the IDENTICAL job
    # untimed, caches dropped in between, so timed reps measure the
    # engine, not the JVM's first morning.
    idx = None
    build_reps: list[float] = []
    for rep in range(warm_reps + timed_reps):
        if idx is not None:
            spark.catalog.clearCache()
        t0 = time.time()
        # prune to the columns the build uses BEFORE the doc-store
        # shuffle: role/tool/ts otherwise ride through the exchange and
        # get pinned in the cache (the reference indexes (docid, text)
        # only — indexing/MsMarcoIndexer). The select reaches the scan
        # (ReadSchema) so the parquet read shrinks too.
        tr = spark.read.parquet(input_path).select(
            "conv_id", "turn_idx", "text"
        )
        docs = assign_doc_ids(tr, ["conv_id", "turn_idx"],
                              num_partitions=doc_partitions)
        idx = build_index(docs, analyzer="english", cache=True)
        idx.tokens.count()      # materialize postings-level artifact
        if rep >= warm_reps:
            build_reps.append(round(time.time() - t0, 3))
    index_sec = min(build_reps)
    timings["index_build"] = index_sec
    timings["index_build_reps"] = build_reps

    # ---- job 2: batch top-k search (1 warm + best-of-timed) ------------
    qdf = spark.createDataFrame(
        _query_set(n_queries), "qid string, qtext string"
    )
    query_reps: list[float] = []
    for rep in range(1 + timed_reps):
        t0 = time.time()
        search(idx, qdf, model="bm25", k=100, strategy="window").count()
        if rep >= 1:
            query_reps.append(round(time.time() - t0, 3))
    query_sec = min(query_reps)
    timings["batch_search"] = query_sec
    timings["batch_search_reps"] = query_reps

    out = {
        "index_turns_per_sec": round(n_turns / index_sec, 1),
        "queries_per_sec": round(n_queries / query_sec, 1),
    }

    if with_bmw or os.environ.get("LMS_SCALING_COMPACT"):
        # One-pass docs -> compressed artifact (fused stem+encode, the
        # tokens table never materialized): the full build-to-shippable-
        # index number. In default mode both reps are recorded and the
        # min taken; under the scaling protocol (LMS_SCALING_COMPACT=1,
        # with_bmw=False) the same warm/timed discipline as index_build
        # applies so the N-vs-4N ratio is steady-state at both levels.
        from lucene_msmarco_spark.operators.postings import (
            build_compact_index,
        )

        cb_warm = warm_reps if not with_bmw else 0
        cb_total = (cb_warm + timed_reps) if not with_bmw else 2
        cb_reps: list[float] = []
        c1 = None
        for rep in range(cb_total):
            if c1 is not None:
                c1.postings.unpersist()
            t0 = time.time()
            c1 = build_compact_index(docs)
            dt = round(time.time() - t0, 3)
            if rep >= cb_warm:
                cb_reps.append(dt)
        timings["compact_build"] = min(cb_reps)
        timings["compact_build_reps"] = cb_reps
        out["compact_build_turns_per_sec"] = round(
            n_turns / min(cb_reps), 1
        )
        c1.postings.unpersist()

    if with_bmw:
        # Segmented batch Block-Max scoring over the compressed postings
        # vs the exhaustive window path, same query subset, in BOTH
        # serving shapes: memory-cached (small-corpus shape) and
        # parquet-backed (the 100-TB shape, where no row-level cache
        # holds the index). The segmented encode itself is timed too —
        # it is a real index-build stage.
        import shutil

        from lucene_msmarco_spark.operators.index import InvertedIndex
        from lucene_msmarco_spark.operators.postings import (
            CompactIndex,
            bmw_search,
        )
        from lucene_msmarco_spark.operators.retrieval import compile_queries

        n_sub = min(1024, n_queries)
        qsub = spark.createDataFrame(
            _query_set(n_sub), "qid string, qtext string"
        )
        t0 = time.time()
        # default layout: segmented, partition-local off the fused build
        # (zero token shuffle; segments = doc-store partitions)
        compact = CompactIndex.from_index(idx)
        compact.postings.persist().count()
        timings["bmw_encode"] = round(time.time() - t0, 3)
        qt = compile_queries(qsub, "english")
        t0 = time.time()
        bmw_search(compact, qt, k=100).count()
        bmw_sec = time.time() - t0
        timings["bmw_search"] = round(bmw_sec, 3)
        t0 = time.time()
        search(idx, qsub, model="bm25", k=100, strategy="window").count()
        ex_sec = time.time() - t0
        timings["exhaustive_subset"] = round(ex_sec, 3)
        out["bmw_queries_per_sec"] = round(n_sub / bmw_sec, 1)
        out["exhaustive_subset_queries_per_sec"] = round(n_sub / ex_sec, 1)

        # disk-backed serving shape
        tok_pq = os.path.join(SCRATCH, "bench_tokens_pq")
        blob_pq = os.path.join(SCRATCH, "bench_blobs_pq")
        shutil.rmtree(tok_pq, ignore_errors=True)
        shutil.rmtree(blob_pq, ignore_errors=True)
        idx.tokens.write.parquet(tok_pq)
        compact.postings.write.parquet(blob_pq)
        idx_disk = InvertedIndex(
            docs=idx.docs, tokens=spark.read.parquet(tok_pq),
            doc_stats=idx.doc_stats, term_stats=idx.term_stats,
            stats=idx.stats, analyzer=idx.analyzer,
        )
        compact_disk = CompactIndex(
            postings=spark.read.parquet(blob_pq), stats=compact.stats,
            analyzer=compact.analyzer,
        )
        t0 = time.time()
        bmw_search(compact_disk, qt, k=100).count()
        bmw_disk_sec = time.time() - t0
        timings["bmw_search_disk"] = round(bmw_disk_sec, 3)
        t0 = time.time()
        search(idx_disk, qsub, model="bm25", k=100,
               strategy="window").count()
        ex_disk_sec = time.time() - t0
        timings["exhaustive_subset_disk"] = round(ex_disk_sec, 3)
        out["bmw_disk_queries_per_sec"] = round(n_sub / bmw_disk_sec, 1)
        out["exhaustive_disk_queries_per_sec"] = round(
            n_sub / ex_disk_sec, 1
        )

        # optional big-batch run (LMS_BMW_BIGBATCH=1): drives the
        # max_batch_queries chunking at >=100k queries — evidence the
        # driver-side query bag stays bounded (VERDICT r3 next-#4)
        if os.environ.get("LMS_BMW_BIGBATCH"):
            n_big = int(os.environ.get("LMS_BMW_BIGBATCH_QUERIES",
                                       "131072"))
            qbig = spark.createDataFrame(
                _query_set(n_big), "qid string, qtext string"
            )
            qtb = compile_queries(qbig, "english")
            t0 = time.time()
            bmw_search(compact, qtb, k=100).count()
            big_sec = time.time() - t0
            timings["bmw_bigbatch"] = round(big_sec, 3)
            out["bmw_bigbatch_queries"] = n_big
            out["bmw_bigbatch_queries_per_sec"] = round(n_big / big_sec, 1)

    return out


def run_bench(master: str, input_path: str | None = None,
              with_sf_queries: bool = True) -> dict:
    from lucene_msmarco_spark import entry_queries
    from lucene_msmarco_spark.session import build_session

    # Hard CPU cap for honest core accounting: local[N] bounds EXECUTOR
    # task slots only — Arrow python workers (the stem/finisher
    # processes) run outside that budget, so an un-pinned "local[2]" can
    # burn ~4 cores. On a real cluster python workers share the
    # executor's cores; the cpuset reproduces that. Inherited by the JVM
    # and every python worker it forks.
    cpuset = os.environ.get("LMS_CPUSET")
    if cpuset and hasattr(os, "sched_setaffinity"):
        os.sched_setaffinity(0, set(range(int(cpuset))))

    if input_path is None:
        input_path = ensure_input(N_BENCH_TURNS)

    spark = build_session(
        app_name="lms-bench", master=master,
        shuffle_partitions=int(SHUFFLE_PARTITIONS) if SHUFFLE_PARTITIONS
        else None,
    )
    timings: dict[str, float] = {}
    t_all = time.time()

    if with_sf_queries:
        for name in ("bm25_topk", "eval_metrics", "dedup_minhash_lsh",
                     "ann_cosine_topk", "text_quality"):
            q = entry_queries.make_spark_query(name)
            t0 = time.time()
            q(spark, SF_DIR).count()
            timings[name] = round(time.time() - t0, 3)

        # streaming surface: the applyInPandasWithState sessionizer over
        # the sf events table as a bounded backfill (readStream ->
        # stateful op -> parquet sink, availableNow + drain). The time
        # includes BOTH streaming query startups and the state-store
        # lifecycle — the honest cost of the streaming path end to end.
        from lucene_msmarco_spark.streaming.analytics import (
            cleanup_dirs,
            scratch_dirs,
            sessionize_backfill,
        )

        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        n_ev = ev.count()
        src, sink, ckpt = scratch_dirs("lms_bench_stream")
        try:
            ev.write.mode("overwrite").parquet(src + "/b0")
            t0 = time.time()
            sessionize_backfill(spark, src, sink, ckpt).count()
            stream_sec = time.time() - t0
            timings["stream_sessionize"] = round(stream_sec, 3)
        finally:
            cleanup_dirs(src, sink, ckpt)

    n_q = N_BENCH_QUERIES if with_sf_queries else N_SCALING_QUERIES
    throughput = _bench_engine(
        spark, input_path, n_q, timings, with_bmw=with_sf_queries,
        timed_reps=int(os.environ.get("LMS_TIMED_REPS", "1")),
    )
    if with_sf_queries and "stream_sessionize" in timings:
        throughput["stream_events_per_sec"] = round(
            n_ev / timings["stream_sessionize"], 1
        )

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


def _cpu_stat() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from /proc/stat — the sandbox is a
    shared-host microVM, and steal is the direct measure of how much CPU
    the host took back during a run."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), steal


def _steal_frac(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[0] - before[0]
    return (after[1] - before[1]) / dt if dt > 0 else 0.0


def _calib_work(_):
    import hashlib

    x = b"x" * 1000
    # sized ~2.5s/task so process-pool startup (~0.3s) cannot distort
    # the per-task ratio between a 1-worker and a 4-worker pool
    for _i in range(4_000_000):
        x = hashlib.md5(x[:64]).digest() * 16
    return 1


def _calib_membw(_):
    """Bandwidth-bound fixed workload: repeated whole-array traversals
    of a buffer 2x the 260 MiB L3, so EVERY level is DRAM-bound and the
    measured ceiling is conservative (the engine's own working sets are
    partially L3-resident at low concurrency, which would show even
    more contention). The engine's index build is memory-bandwidth-
    bound (token-level hash aggregation + Arrow + pandas groupbys), so
    THIS kernel's N-vs-4N per-task efficiency is the host ceiling that
    actually binds it; md5 measures the compute ceiling that binds the
    query job."""
    import numpy as np

    x = np.ones(512 * 2**20 // 8)  # 512 MiB of float64
    s = 0.0
    for _i in range(20):
        x += 1.0          # read+write full array
        s += float(x[::4096].sum())
    return s


def _host_parallel_calibration(small: int, big: int,
                               work=_calib_work) -> dict:
    """Measure THIS VM's own parallel efficiency between the two levels
    with a fixed per-task workload (no Spark): per-task wall at
    `big`-way over per-task wall at `small`-way. On a real
    multi-executor cluster each added executor brings unshared cores
    AND an unshared memory system, so this ratio is ~1.0 there; on this
    sandbox concurrent threads share SMT ports, LLC and one socket's
    memory bandwidth, and the measured ceiling bounds ANY engine's raw
    thread-scaling for workloads of that resource class. Reported
    alongside the raw numbers so engine efficiency and host ceiling are
    separable."""
    from multiprocessing import Pool

    out = {}
    for n in (small, big):
        best = None
        for _rep in range(2):
            t0 = time.time()
            with Pool(n) as p:
                p.map(work, range(n))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[n] = best
    # per-task slowdown at big vs small; host efficiency = small/big
    return {
        "per_task_sec": {str(k): round(v, 3) for k, v in out.items()},
        "host_cpu_efficiency": round(out[small] / out[big], 3),
    }


def scaling() -> None:
    """One subprocess per level; inside it the full job runs
    LMS_WARM_REPS times untimed (JIT steady state — see module
    docstring) and LMS_SCALING_REPS times timed, best-of reported.
    Partitioning is data-sized and IDENTICAL at both levels (doc store
    ~37.5k turns/partition; one fixed shuffle-partition count), so the
    two levels run the same set of tasks and differ only in
    concurrency — the N-vs-4N-executors question. Each level is cpuset-
    pinned to exactly N cores (local[N] bounds executor threads only;
    Arrow python workers would otherwise run outside the budget). Raw
    efficiency is reported next to TWO host ceilings measured with fixed
    per-task workloads at the same two levels — compute (md5) and
    memory bandwidth (whole-array traversal) — and the host-normalized
    engine efficiency divides each job's raw number by the ceiling of
    its resource class: on a real cluster added executors bring
    unshared cores AND unshared memory systems (both ceilings ~1),
    which this sandbox's one shared socket does not."""
    input_path = ensure_input(N_SCALING_TURNS)
    doc_parts = max(8, round(N_SCALING_TURNS / 37500))
    shuffle_parts = max(16, doc_parts)
    calib = _host_parallel_calibration(SCALING_SMALL, SCALING_BIG)
    calib_bw = _host_parallel_calibration(SCALING_SMALL, SCALING_BIG,
                                          work=_calib_membw)
    results = {}
    steal: dict[int, list[float]] = {SCALING_SMALL: [], SCALING_BIG: []}
    steal_tainted: dict[int, bool] = {}
    # reject-and-retry on hypervisor steal: a rep whose steal fraction
    # exceeds LMS_STEAL_MAX was visibly preempted by the host and would
    # bias whichever level it hit (steal was previously recorded but
    # not acted on — ADVICE r3 #4)
    steal_max = float(os.environ.get("LMS_STEAL_MAX", "0.05"))
    for n in (SCALING_SMALL, SCALING_BIG):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(n),
            LMS_CPUSET=str(n),
            LMS_SHUFFLE_PARTITIONS=str(shuffle_parts),
            LMS_DOC_PARTITIONS=str(doc_parts),
            LMS_TIMED_REPS=str(SCALING_REPS),
        )
        env.setdefault("LMS_WARM_REPS", "2")
        # size the executor heap to the workload (as a real cluster
        # deployment would); measured: an undersized shared heap
        # throttles the high-parallelism level via GC, the low one
        # barely at all — i.e. it distorts the ratio, not just speed
        env.setdefault("SPARK_DRIVER_MEM", "48g")
        for attempt in range(3):
            stat0 = _cpu_stat()
            p = subprocess.run(
                [sys.executable, __file__, "--master", f"local[{n}]",
                 "--input", input_path, "--engine-only"],
                capture_output=True, text=True, env=env, cwd=REPO,
            )
            frac = round(_steal_frac(stat0, _cpu_stat()), 4)
            steal[n].append(frac)
            lines = [ln for ln in p.stdout.splitlines()
                     if ln.startswith("{")]
            if not lines:
                sys.stderr.write(p.stdout + "\n" + p.stderr)
                raise SystemExit("scaling subprocess produced no JSON")
            results[n] = json.loads(lines[-1])
            steal_tainted[n] = frac > steal_max
            if frac <= steal_max:
                break
            sys.stderr.write(
                f"steal {frac} > {steal_max} at local[{n}] "
                f"(attempt {attempt + 1}); re-running level\n"
            )
    calib_after = _host_parallel_calibration(SCALING_SMALL, SCALING_BIG)
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
    # context metric (not part of the gate): the one-pass fused
    # docs->compressed-artifact build, when LMS_SCALING_COMPACT=1
    cb_s = r_s["throughput"].get("compact_build_turns_per_sec")
    cb_b = r_b["throughput"].get("compact_build_turns_per_sec")
    eff_cb = (cb_b / cb_s / factor) if cb_s and cb_b else None
    host_eff = calib["host_cpu_efficiency"]
    host_bw_eff = calib_bw["host_cpu_efficiency"]
    # engine efficiency: raw thread-scaling divided by what the HOST
    # itself delivers between the same two levels for a fixed per-task
    # workload of the matching resource class — md5 (compute ceiling)
    # for the codegen-bound query job, whole-array traversal (memory-
    # bandwidth ceiling) for the aggregation-bound index build. On a
    # real cluster (separate machines per executor) both ceilings are
    # ~1 and engine == raw; on this single-socket sandbox concurrent
    # threads share SMT ports, LLC and DRAM channels, which caps raw
    # below the engine's own behavior.
    # normalized values are capped at 1.0: a ratio above 1 only means
    # the measured ceiling binds harder than the engine's own mix.
    eng_idx = min(eff_idx / host_bw_eff, 1.0) if host_bw_eff else float("nan")
    eng_q = min(eff_q / host_eff, 1.0) if host_eff else float("nan")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run ({N_SCALING_TURNS} turns, "
            f"{N_SCALING_QUERIES} queries, same parquet input, "
            f"local[{SCALING_SMALL}] vs local[{SCALING_BIG}], "
            f"steady-state: {os.environ.get('LMS_WARM_REPS', '2')} warm + "
            f"best-of-{SCALING_REPS} timed reps, data-sized partitioning "
            f"identical at both levels ({doc_parts} doc / "
            f"{shuffle_parts} shuffle), cpuset-pinned N cores per level "
            f"(executor threads AND python workers), tmpfs shuffle "
            f"dirs, 48g heap)\n\n"
            "| parallelism | index turns/sec | queries/sec |\n"
            "|---|---|---|\n"
            f"| local[{SCALING_SMALL}] | "
            f"{r_s['throughput']['index_turns_per_sec']} | "
            f"{r_s['throughput']['queries_per_sec']} |\n"
            f"| local[{SCALING_BIG}] | "
            f"{r_b['throughput']['index_turns_per_sec']} | "
            f"{r_b['throughput']['queries_per_sec']} |\n\n"
            f"- raw scaling efficiency (index build, "
            f"(rate_big/rate_small)/{factor:.0f}): **{eff_idx:.3f}**\n"
            f"- raw scaling efficiency (batch query): **{eff_q:.3f}**\n"
            + (
                f"- raw scaling efficiency (one-pass compact build, "
                f"context metric: {cb_s} -> {cb_b} turns/s): "
                f"**{eff_cb:.3f}**\n" if eff_cb is not None else ""
            )
            + f"- host compute ceiling "
            f"{SCALING_SMALL}->{SCALING_BIG}-way (pure-Python md5, "
            f"no Spark; per-task {calib['per_task_sec']}): "
            f"**{host_eff:.3f}** before, "
            f"**{calib_after['host_cpu_efficiency']:.3f}** after\n"
            f"- host memory-bandwidth ceiling "
            f"{SCALING_SMALL}->{SCALING_BIG}-way (numpy whole-array "
            f"traversal >> LLC; per-task {calib_bw['per_task_sec']}): "
            f"**{host_bw_eff:.3f}**\n"
            f"- host-normalized ENGINE efficiency: index "
            f"**{eng_idx:.3f}** (raw / bandwidth ceiling — the build "
            f"is aggregation/bandwidth-bound), query **{eng_q:.3f}** "
            f"(raw / compute ceiling). CALIBRATION-DEPENDENT MODEL, "
            f"not a measurement (the 1.0 clamp can mask ceiling "
            f"miscalibration) — any pass/fail gate reads the RAW "
            f"efficiencies above\n"
            f"- hypervisor steal fraction per level attempt (attempts "
            f"above LMS_STEAL_MAX={steal_max} were re-run): "
            f"local[{SCALING_SMALL}] {steal[SCALING_SMALL]}, "
            f"local[{SCALING_BIG}] {steal[SCALING_BIG]}\n"
            + (
                "- **STEAL-TAINTED RUN**: a level exhausted its retries "
                "with steal above the threshold; the numbers above come "
                "from a visibly preempted measurement — do not gate on "
                "this run\n"
                if any(steal_tainted.values()) else ""
            )
            + f"- per-rep timings (sec): local[{SCALING_SMALL}] build "
            f"{r_s['queries'].get('index_build_reps')} query "
            f"{r_s['queries'].get('batch_search_reps')}; "
            f"local[{SCALING_BIG}] build "
            f"{r_b['queries'].get('index_build_reps')} query "
            f"{r_b['queries'].get('batch_search_reps')}\n"
        )
    print(json.dumps({
        "metric": "scaling_efficiency",
        # the headline value is the RAW worst-of-two: the normalized
        # figures are a calibration-dependent model kept for context
        "value": round(min(eff_idx, eff_q), 3),
        "unit": "ratio (raw worst-of index/query; normalized_* are "
                "calibration-dependent context)",
        "normalized_index_efficiency": round(eng_idx, 3),
        "normalized_query_efficiency": round(eng_q, 3),
        "raw_index_efficiency": round(eff_idx, 3),
        "raw_query_efficiency": round(eff_q, 3),
        **({"raw_compact_efficiency": round(eff_cb, 3)}
           if eff_cb is not None else {}),
        "host_cpu_efficiency": host_eff,
        "host_membw_efficiency": host_bw_eff,
        "host_cpu_efficiency_after": calib_after["host_cpu_efficiency"],
        "steal_frac": {str(k): v for k, v in steal.items()},
        # True for a level that exhausted its retries still above
        # LMS_STEAL_MAX: its result is from a visibly preempted run and
        # the headline value must not be gated on
        "steal_exceeded_after_retries": {
            str(k): v for k, v in steal_tainted.items()
        },
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
