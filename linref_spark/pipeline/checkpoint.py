"""Checkpointed, resumable pipeline stages with lineage and metrics.

The north rule requires every stage to write snapshot checkpoints with
per-partition lineage + metrics so a 10^12-document run resumes instead of
recomputing. This module implements that contract over parquet + a JSON
manifest — the sandbox stand-in for Iceberg: a stage's committed output
directory corresponds to an Iceberg snapshot; the manifest rows correspond
to snapshot metadata (swap ``_write``/``_read`` for
``writeTo(...).createOrReplace()`` / ``spark.read.table`` and record
``snapshot_id`` instead of the fingerprint to run on a real catalog).

Semantics:

- a ``Stage`` is a named pure function ``(spark, {input stages}) -> DataFrame``;
- ``Pipeline.run`` executes stages in order; a stage is SKIPPED when the
  manifest holds a committed entry whose *input fingerprints* match the
  current upstream fingerprints (transitive: editing stage 2 re-runs 3..n
  but not 1);
- each committed entry records: fingerprint, input fingerprints, row
  count, wall seconds, bytes written, and per-partition row counts
  (lineage + skew evidence: max/mean partition ratio).

Writes are atomic-ish: output lands in ``<stage>.tmp-<fingerprint>`` and is
renamed into place before the manifest commits, so a crashed run never
leaves a committed-but-partial stage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, Dict[str, DataFrame]], DataFrame]
    inputs: Sequence[str] = field(default_factory=tuple)
    # version participates in the fingerprint: bump to force recompute
    version: str = "1"


def _partition_counts(df: DataFrame) -> List[int]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .orderBy("p")
        .collect()
    )
    return [int(r["count"]) for r in rows]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


class Pipeline:
    def __init__(self, base_dir: str, stages: Sequence[Stage]):
        self.base_dir = base_dir
        self.stages = list(stages)
        names = [s.name for s in stages]
        if len(set(names)) != len(names):
            raise ValueError("Stage names must be unique")

    # -- manifest -------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, MANIFEST)

    def _load_manifest(self) -> dict:
        p = self._manifest_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"stages": {}}

    def _save_manifest(self, manifest: dict) -> None:
        os.makedirs(self.base_dir, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path())

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _fingerprint(self, stage: Stage, input_fps: Dict[str, str]) -> str:
        payload = json.dumps(
            {"name": stage.name, "version": stage.version, "inputs": input_fps},
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    # -- execution ------------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        force: bool = False,
        log: Optional[Callable[[str], None]] = print,
    ) -> Dict[str, DataFrame]:
        manifest = self._load_manifest()
        outputs: Dict[str, DataFrame] = {}
        fps: Dict[str, str] = {}
        for stage in self.stages:
            missing = [i for i in stage.inputs if i not in outputs]
            if missing:
                raise ValueError(f"Stage {stage.name} missing inputs: {missing}")
            input_fps = {i: fps[i] for i in stage.inputs}
            fp = self._fingerprint(stage, input_fps)
            fps[stage.name] = fp
            entry = manifest["stages"].get(stage.name)
            out_dir = self._stage_dir(stage.name)
            if (
                not force
                and entry
                and entry.get("fingerprint") == fp
                and entry.get("committed")
                and os.path.exists(out_dir)
            ):
                if log:
                    log(f"[pipeline] {stage.name}: resume from checkpoint ({fp})")
                outputs[stage.name] = spark.read.parquet(out_dir)
                continue

            t0 = time.time()
            df = stage.fn(spark, {i: outputs[i] for i in stage.inputs})
            tmp_dir = f"{out_dir}.tmp-{fp}"
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)
            df.write.mode("overwrite").parquet(tmp_dir)
            committed = spark.read.parquet(tmp_dir)
            part_counts = _partition_counts(committed)
            n_rows = sum(part_counts)
            if os.path.exists(out_dir):
                shutil.rmtree(out_dir)
            os.replace(tmp_dir, out_dir)
            elapsed = time.time() - t0
            mean_p = (n_rows / len(part_counts)) if part_counts else 0.0
            manifest["stages"][stage.name] = {
                "fingerprint": fp,
                "inputs": input_fps,
                "committed": True,
                "rows": n_rows,
                "bytes": _dir_bytes(out_dir),
                "wall_sec": round(elapsed, 3),
                "partitions": len(part_counts),
                "partition_rows_max": max(part_counts) if part_counts else 0,
                "partition_rows_mean": round(mean_p, 2),
                "skew_ratio": round(max(part_counts) / mean_p, 3)
                if part_counts and mean_p > 0
                else 0.0,
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            self._save_manifest(manifest)
            if log:
                log(
                    f"[pipeline] {stage.name}: computed {n_rows} rows in "
                    f"{elapsed:.1f}s ({fp})"
                )
            outputs[stage.name] = spark.read.parquet(out_dir)
        return outputs

    def metrics(self) -> dict:
        return self._load_manifest()["stages"]
