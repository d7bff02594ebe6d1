"""Checkpoint-resumable index-build pipeline with per-partition lineage,
plus a Structured-Streaming incremental ingest path.

North-rule requirements covered here:
- "merge partial segments into a global index with per-partition lineage
  and checkpoint-resumable stages": every stage is a pure function of
  (input fingerprint, config hash); it writes parquet + a manifest row
  recording stage name, hashes, row count, per-partition row counts and
  wall time. Re-running the pipeline skips any stage whose manifest row
  matches and whose output ``_SUCCESS`` exists — kill it between stages
  and the next run resumes exactly where it stopped.
- incremental build: ``IncrementalIngest`` uses
  ``readStream.trigger(availableNow=True)`` + ``foreachBatch`` to turn
  newly-landed transcript files into partial posting segments (the
  Lucene "new segment per flush" analog, cf. the reference's
  ``IndexWriter`` lifecycle ``indexing/MsMarcoIndexer.java:48-60``), and
  ``merge_segments`` compacts partials into the global postings table
  (Lucene background-merge analog, SURVEY.md §4 segment row).

The reference's only idempotence device is refusing to overwrite a
non-empty index dir (``MsMarcoIndexer.java:49-52``); the engine replaces
that with content-addressed stage manifests.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.index import assign_doc_ids, build_index
from ..operators.postings import encode_postings

STAGES = ("doc_ids", "tokens_tf", "doc_stats", "term_stats", "postings")


def _sha(obj) -> str:
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def input_fingerprint(path: str) -> str:
    """Content-address the input directory by (name, size, mtime) of its
    data files — cheap, no data read."""
    entries = []
    for root, dirs, files in os.walk(path):
        # os.walk's subdirectory order is filesystem-dependent; sort it
        # in place so an identical tree always hashes identically (the
        # fingerprint gates checkpoint resume)
        dirs.sort()
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            st = os.stat(os.path.join(root, f))
            entries.append((os.path.relpath(os.path.join(root, f), path),
                            st.st_size, int(st.st_mtime)))
    return _sha(entries)


def _partition_lineage(df: DataFrame) -> list[dict]:
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("_pid")
        .collect()
    )
    return [{"partition": int(r["_pid"]), "rows": int(r["rows"])}
            for r in rows]


@dataclass
class BuildConfig:
    analyzer: str = "english"
    fold_numbers: bool = True
    block_size: int = 128
    salt_df_threshold: int = 250_000
    n_salts: int = 32

    def hash(self) -> str:
        return _sha(self.__dict__)


@dataclass
class IndexBuildPipeline:
    """Staged transcripts -> inverted-index build over parquet checkpoints.

    Layout under ``out_dir``::

        _manifest.jsonl           one JSON row per completed stage
        doc_ids/  tokens_tf/  doc_stats/  term_stats/  postings/
    """

    spark: SparkSession
    input_path: str
    out_dir: str
    config: BuildConfig = field(default_factory=BuildConfig)

    # ---- manifest ------------------------------------------------------

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.out_dir, "_manifest.jsonl")

    def manifest(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        row = json.loads(line)
                        out[row["stage"]] = row  # last write wins
        return out

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def _is_done(self, stage: str, fp: str, cfg_hash: str) -> bool:
        row = self.manifest().get(stage)
        return bool(
            row
            and row["input_fingerprint"] == fp
            and row["config_hash"] == cfg_hash
            and os.path.exists(
                os.path.join(self._stage_dir(stage), "_SUCCESS")
            )
        )

    def _record(self, stage: str, fp: str, cfg_hash: str,
                df: DataFrame, wall_s: float) -> None:
        out = self.spark.read.parquet(self._stage_dir(stage))
        lineage = _partition_lineage(out)
        row = {
            "stage": stage,
            "input_fingerprint": fp,
            "config_hash": cfg_hash,
            "rows": sum(p["rows"] for p in lineage),
            "partitions": lineage,
            "wall_s": round(wall_s, 3),
            "completed_at": time.time(),
        }
        os.makedirs(self.out_dir, exist_ok=True)
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # ---- stages --------------------------------------------------------

    def run(self, resume: bool = True) -> dict[str, dict]:
        """Execute all stages (skipping completed ones when ``resume``).
        Returns the manifest. Kill-safe: each stage commits atomically via
        parquet ``_SUCCESS`` + its manifest row."""
        fp = input_fingerprint(self.input_path)
        ch = self.config.hash()
        executed: list[str] = []
        # persist the build config READABLY (not just its hash) so a
        # later load_pipeline_index can restore analyzer etc. — the
        # manifest rows alone only carry config_hash
        os.makedirs(self.out_dir, exist_ok=True)
        with open(os.path.join(self.out_dir, "_config.json"), "w") as f:
            json.dump(dict(self.config.__dict__, config_hash=ch), f)

        def stage(name: str, fn) -> None:
            if resume and self._is_done(name, fp, ch):
                return
            t0 = time.time()
            df = fn()
            df.write.mode("overwrite").parquet(self._stage_dir(name))
            self._record(name, fp, ch, df, time.time() - t0)
            executed.append(name)

        stage("doc_ids", self._build_doc_ids)
        stage("tokens_tf", self._build_tokens)
        stage("doc_stats", self._build_doc_stats)
        stage("term_stats", self._build_term_stats)
        stage("postings", self._build_postings)
        m = self.manifest()
        m["_executed"] = {"stages": executed}
        return m

    def _build_doc_ids(self) -> DataFrame:
        tr = self.spark.read.parquet(self.input_path)
        return assign_doc_ids(tr, ["conv_id", "turn_idx"])

    def _read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_dir(stage))

    def _build_tokens(self) -> DataFrame:
        docs = self._read("doc_ids")
        idx = build_index(
            docs,
            analyzer=self.config.analyzer,
            fold_numbers=self.config.fold_numbers,
            cache=False,
        )
        return idx.tokens.select("term", "doc_id", "tf", "doclen")

    def _build_doc_stats(self) -> DataFrame:
        tokens = self._read("tokens_tf")
        docs = self._read("doc_ids").select("doc_id")
        per_doc = tokens.groupBy("doc_id").agg(
            F.first("doclen").alias("doclen")
        )
        return docs.join(per_doc, "doc_id", "left").fillna(
            0, subset=["doclen"]
        )

    def _build_term_stats(self) -> DataFrame:
        tokens = self._read("tokens_tf")
        return tokens.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").alias("cf"),
        )

    def _build_postings(self) -> DataFrame:
        tokens = self._read("tokens_tf")
        return encode_postings(
            tokens,
            block_size=self.config.block_size,
            salt_df_threshold=self.config.salt_df_threshold,
            n_salts=self.config.n_salts,
        )


# ---------------------------------------------------------------------------
# Structured-Streaming incremental ingest
# ---------------------------------------------------------------------------

@dataclass
class IncrementalIngest:
    """Transcript files land in ``input_dir``; each availableNow batch
    becomes one partial postings segment under ``segments_dir``.
    ``merge_segments`` compacts all segments into ``global_dir``."""

    spark: SparkSession
    input_dir: str
    work_dir: str
    config: BuildConfig = field(default_factory=BuildConfig)

    @property
    def segments_dir(self) -> str:
        return os.path.join(self.work_dir, "segments")

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.work_dir, "_stream_checkpoint")

    @property
    def global_dir(self) -> str:
        return os.path.join(self.work_dir, "postings")

    def ingest_available(self) -> int:
        """Process all currently-available input files; returns the number
        of batches (segments) written. Restart-safe via the stream
        checkpoint (files already ingested are never re-read)."""
        from ..sources.transcripts import TRANSCRIPT_SCHEMA

        cfg = self.config
        batches = {"n": 0}

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.rdd.isEmpty():
                return
            docs = assign_doc_ids(batch_df, ["conv_id", "turn_idx"])
            # segment-local doc ids are offset by a per-segment base so
            # ids stay globally unique (base = batch_id << 40; at
            # 10^12-turn scale the base would come from a sequencer table)
            docs = docs.withColumn(
                "doc_id",
                (F.col("doc_id") + F.lit(int(batch_id) << 40)).cast("long"),
            )
            idx = build_index(
                docs, analyzer=cfg.analyzer,
                fold_numbers=cfg.fold_numbers, cache=False,
            )
            seg = encode_postings(
                idx.tokens, block_size=cfg.block_size,
                salt_df_threshold=cfg.salt_df_threshold,
                n_salts=cfg.n_salts,
            )
            seg.write.mode("overwrite").parquet(
                os.path.join(self.segments_dir, f"segment={batch_id}")
            )
            batches["n"] += 1

        q = (
            self.spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .parquet(self.input_dir)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batches["n"]

    def merge_segments(self) -> DataFrame:
        """Compact all partial segments into the global postings table
        (decode -> concat -> re-encode per term, same as the salted-build
        merge stage). Returns the merged postings DataFrame."""
        from ..operators.postings import (
            POSTINGS_SCHEMA,
            _make_merger,
        )

        segs = self.spark.read.option("basePath", self.segments_dir).parquet(
            os.path.join(self.segments_dir, "segment=*")
        )
        merged = segs.groupBy("term").applyInPandas(
            _make_merger(self.config.block_size), schema=POSTINGS_SCHEMA
        )
        merged.write.mode("overwrite").parquet(self.global_dir)
        return self.spark.read.parquet(self.global_dir)
