"""Stage checkpointing with per-partition lineage and exact resume (T4).

North-rule requirement absent from the reference (its streaming keeps stats
only — reference: src/core/services/streaming.py:90-132): every stage's
output is committed as a snapshot; a ``_lineage`` table records per-stage,
per-partition row counts and wall time; resume restarts from the last
committed snapshot.

Production target is Iceberg (stage tables with snapshot-id recorded); this
sandbox has no Iceberg runtime jar, so snapshots are emulated with parquet
directories committed via an atomic manifest marker written AFTER the data:
a stage is committed iff its manifest parses, so a kill mid-write is never
mistaken for a committed snapshot. Snapshots are VERSIONED with Iceberg's
headline semantics: every commit writes a fresh ``data-<snapshot_id>``
directory and flips the manifest pointer last, prior snapshots stay
readable by id (``read(stage, snapshot_id)`` — time travel), ``rollback``
flips the current pointer without rewriting data, ``expire_snapshots``
enforces retention, and ``history`` lists every commit.
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = ("stage string, snapshot_id string, partition_id int, "
                  "rows_out bigint, wall_ms bigint")


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _manifest(self, stage: str) -> Path:
        return self.root / stage / "manifest.json"

    def _history(self, stage: str) -> Path:
        return self.root / stage / "history.jsonl"

    def _data(self, stage: str, snapshot_id: str | None = None) -> str:
        """Current snapshot's data dir (or a specific snapshot's).

        Snapshots are VERSIONED (Iceberg-style): each commit writes a
        fresh ``data-<snapshot_id>`` directory and flips the manifest
        pointer last, so earlier snapshots stay readable (time travel)
        until expired. Pre-versioning checkpoints used a bare ``data``
        dir; manifests without a data_path fall back to it.
        """
        if snapshot_id is not None:
            return str(self.root / stage / f"data-{snapshot_id}")
        info = self.snapshot_info(stage)
        if info and info.get("data_path"):
            return str(self.root / stage / info["data_path"])
        return str(self.root / stage / "data")

    def is_committed(self, stage: str) -> bool:
        m = self._manifest(stage)
        if not m.exists():
            return False
        try:
            json.loads(m.read_text())
            return True
        except ValueError:
            return False

    def read(self, stage: str, snapshot_id: str | None = None) -> DataFrame:
        """Read the stage's CURRENT snapshot, or a specific retained one
        by id (time travel). Count-only stages (``count_stage``) have no
        data to read and raise a descriptive error, not a missing-parquet
        path."""
        self._reject_count_only(stage, "read")
        info = self.snapshot_info(stage)
        if info and info.get("file_manifest"):
            raise ValueError(
                f"stage '{stage}' is a file-manifest stage; use "
                "read_file_manifest() for its file list")
        return self.spark.read.parquet(self._data(stage, snapshot_id))

    def _reject_count_only(self, stage: str, op: str) -> None:
        info = self.snapshot_info(stage)
        if info and info.get("count_only"):
            raise ValueError(
                f"stage '{stage}' was committed via count_stage (count-only"
                f" manifest, no data snapshot); {op}() is not available —"
                f" use snapshot_info('{stage}')['rows'] for its cardinality")

    def snapshot_info(self, stage: str) -> dict | None:
        if not self.is_committed(stage):
            return None
        return json.loads(self._manifest(stage).read_text())

    def history(self, stage: str) -> list[dict]:
        """All committed snapshots of a stage, oldest first."""
        h = self._history(stage)
        if not h.exists():
            return []
        return [json.loads(line)
                for line in h.read_text().splitlines() if line.strip()]

    def rollback(self, stage: str, snapshot_id: str) -> None:
        """Point the stage back at an earlier retained snapshot (the
        Iceberg rollback): the manifest pointer flips, nothing is
        rewritten; a later stage(force=True) run commits a NEW snapshot
        on top."""
        self._reject_count_only(stage, "rollback")
        for entry in self.history(stage):
            if entry["snapshot_id"] == snapshot_id:
                # file-manifest snapshots have no data dir of their own:
                # the pointer flip is the whole rollback
                if not entry.get("file_manifest"):
                    data = Path(self._data(stage, snapshot_id))
                    if not data.exists():
                        raise ValueError(
                            f"snapshot {snapshot_id} of {stage} was expired")
                self._manifest(stage).write_text(json.dumps(entry))
                return
        raise ValueError(f"no committed snapshot {snapshot_id} for {stage}")

    def expire_snapshots(self, stage: str, keep_last: int = 1) -> list[str]:
        """Retention: delete the data of all but the newest ``keep_last``
        snapshots (never the current pointer). Returns expired ids."""
        import shutil
        current = (self.snapshot_info(stage) or {}).get("snapshot_id")
        entries = self.history(stage)
        expired = []
        for entry in entries[:-keep_last] if keep_last > 0 else entries:
            sid = entry["snapshot_id"]
            if sid == current:
                continue
            data = Path(self._data(stage, sid))
            if data.exists():
                shutil.rmtree(data)
                expired.append(sid)
        return expired

    def stage(self, name: str, build: Callable[[], DataFrame],
              force: bool = False) -> DataFrame:
        """Run (or resume) a stage. If a committed snapshot exists, read it
        back instead of recomputing — exact resume. A forced re-run
        commits a NEW snapshot version; prior versions stay readable via
        ``read(stage, snapshot_id)`` until ``expire_snapshots``."""
        if not force and self.is_committed(name):
            return self.read(name)
        t0 = time.time()
        df = build()
        snapshot_id = uuid.uuid4().hex
        (self.root / name).mkdir(parents=True, exist_ok=True)
        df.write.mode("overwrite").parquet(self._data(name, snapshot_id))
        wall_ms = int((time.time() - t0) * 1000)

        out = self.read(name, snapshot_id)
        # ONE scan: the per-partition aggregate is collected (bounded by
        # partition count) and the total row count derived from it — no
        # second full count() pass over the snapshot
        part_rows = (out.groupBy(F.spark_partition_id()
                                 .alias("partition_id"))
                     .agg(F.count("*").alias("rows_out"))).collect()
        rows = sum(r["rows_out"] for r in part_rows)
        lineage_rows = ([(name, snapshot_id, r["partition_id"],
                          r["rows_out"], wall_ms) for r in part_rows]
                        or [(name, snapshot_id, -1, 0, wall_ms)])
        self.spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA) \
            .write.mode("append").parquet(str(self.root / "_lineage"))
        # manifest written LAST = the commit point (an atomic pointer
        # flip: the new snapshot's data dir is complete before the
        # pointer moves, and the previous snapshot stays readable);
        # lineage rows from runs killed before this line are orphans
        # that lineage() filters out
        entry = {"stage": name, "snapshot_id": snapshot_id, "rows": rows,
                 "wall_ms": wall_ms, "committed_at": time.time(),
                 "data_path": f"data-{snapshot_id}"}
        with self._history(name).open("a") as h:
            h.write(json.dumps(entry) + "\n")
        self._manifest(name).write_text(json.dumps(entry))
        return out

    def count_stage(self, name: str, df: DataFrame,
                    force: bool = False) -> int:
        """Commit (or resume) a COUNT-ONLY snapshot: the row count is
        recorded in the manifest with no data copy. Pins an input's
        cardinality at first-run time so a resume against a changed input
        still reports the funnel of the run the snapshots belong to."""
        if not force and self.is_committed(name):
            return self.snapshot_info(name)["rows"]
        t0 = time.time()
        rows = df.count()
        (self.root / name).mkdir(parents=True, exist_ok=True)
        self._manifest(name).write_text(json.dumps({
            "stage": name, "snapshot_id": uuid.uuid4().hex, "rows": rows,
            "wall_ms": int((time.time() - t0) * 1000),
            "committed_at": time.time(), "count_only": True}))
        return rows

    def files_stage(self, name: str, files: list[str]) -> dict:
        """Commit a FILE-MANIFEST snapshot: the snapshot IS the sorted
        list of immutable data files visible at commit time — the
        Iceberg manifest concept (a snapshot pins which files belong to
        it; it never copies data). The natural fit is an append-only log
        written by a streaming sink: part files are immutable once
        closed, so an old snapshot's file list reads the log exactly as
        it was. Rollback is the usual pointer flip; expire_snapshots
        does not apply (the files belong to the live log, and deleting
        them would corrupt NEWER snapshots too)."""
        entry = {"stage": name, "snapshot_id": uuid.uuid4().hex,
                 "rows": None, "n_files": len(files), "wall_ms": 0,
                 "committed_at": time.time(), "files": sorted(files),
                 "file_manifest": True}
        (self.root / name).mkdir(parents=True, exist_ok=True)
        with self._history(name).open("a") as h:
            h.write(json.dumps(entry) + "\n")
        self._manifest(name).write_text(json.dumps(entry))
        return entry

    def read_file_manifest(self, name: str,
                           snapshot_id: str | None = None) -> list[str]:
        """The file list of a committed file-manifest snapshot (current
        pointer, or any retained version by id — time travel)."""
        if snapshot_id is None:
            info = self.snapshot_info(name)
        else:
            info = next((e for e in self.history(name)
                         if e["snapshot_id"] == snapshot_id), None)
        if not info:
            raise ValueError(f"no committed snapshot for {name}"
                             + (f" id {snapshot_id}" if snapshot_id else ""))
        if not info.get("file_manifest"):
            raise ValueError(f"stage {name} is not a file-manifest stage "
                             "(use read())")
        return list(info["files"])

    def committed_snapshot_ids(self) -> list[str]:
        """Every committed snapshot id: the current manifest of each stage
        PLUS all history entries (versioned snapshots stay committed until
        expired — without the history scan, lineage() silently dropped the
        rows of retained prior versions)."""
        ids = set()
        for m in self.root.glob("*/manifest.json"):
            try:
                ids.add(json.loads(m.read_text())["snapshot_id"])
            except (ValueError, KeyError):
                continue
        for h in self.root.glob("*/history.jsonl"):
            for line in h.read_text().splitlines():
                if not line.strip():
                    continue
                try:
                    ids.add(json.loads(line)["snapshot_id"])
                except (ValueError, KeyError):
                    continue
        return sorted(ids)

    def lineage(self, committed_only: bool = True) -> DataFrame:
        """Per-partition lineage; by default restricted to snapshot_ids with
        a committed manifest (kills between the lineage append and the
        manifest write can leave orphan rows — never surfaced here)."""
        df = self.spark.read.parquet(str(self.root / "_lineage"))
        if not committed_only:
            return df
        return df.where(F.col("snapshot_id").isin(
            self.committed_snapshot_ids()))

    def reset(self, stage: str) -> None:
        m = self._manifest(stage)
        if m.exists():
            m.unlink()


def run_pipeline_checkpointed(spark: SparkSession, documents: DataFrame,
                              root: str):
    """The full pipeline with one snapshot per stage (A/B/C/D); rerunning
    after a kill resumes from the last committed stage."""
    from ..operators.canon import dedup_triples
    from ..operators.extract import extract_triples, split_errors
    from .pipeline import build_graph

    cp = CheckpointManager(spark, root)

    def stage_a():
        return extract_triples(documents)

    raw = cp.stage("A_extract", stage_a)
    clean, parse_skips = split_errors(raw)

    triples = cp.stage("B_dedup", lambda: dedup_triples(clean))

    res = build_graph(spark, triples, parse_skips)
    entity_types = cp.stage("C_entities", lambda: res.entity_types)
    rel_types = cp.stage("C_relationships", lambda: res.relationship_types)
    skipped = cp.stage("D_skipped", lambda: res.skipped_items)
    return cp, entity_types, rel_types, skipped


def run_curation_checkpointed(spark: SparkSession, documents: DataFrame,
                              eval_docs: DataFrame, root: str,
                              rates: dict[str, int],
                              default_permille: int, budget: int,
                              min_tok: int = 20, rep_factor: int = 8,
                              ngram: int = 4, seed: str = ""):
    """The curation funnel (operators/curate.py) with one snapshot per
    stage: quality filter → exact dedup → decontamination → stratified
    sample → shard assignments. A rerun after a kill resumes from the
    last committed snapshot, and the `_lineage` table carries each
    stage's per-partition survivor counts — the funnel audit trail is the
    lineage itself."""
    from ..operators.curate import (drop_contaminated, keep_exact_keepers,
                                    keep_sampled, pack_shards,
                                    quality_filter)

    cp = CheckpointManager(spark, root)
    # pin the input cardinality alongside the stage snapshots: on resume
    # the funnel's n_in must describe the corpus the snapshots came from,
    # not whatever --input points at now
    cp.count_stage("00_input", documents)
    quality = cp.stage("A_quality", lambda: quality_filter(
        documents, min_tok, rep_factor))
    unique = cp.stage("B_exact_dedup",
                      lambda: keep_exact_keepers(quality))
    clean = cp.stage("C_decontaminate",
                     lambda: drop_contaminated(unique, eval_docs, ngram))
    sampled = cp.stage("D_sample", lambda: keep_sampled(
        clean, rates, default_permille, seed=seed))
    assignments = cp.stage("E_pack", lambda: pack_shards(sampled, budget))
    return cp, assignments
