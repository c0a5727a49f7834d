"""Per-stage checkpoint manifest for resumable pipelines.

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule) for a batch Ray Data pipeline means: each
pipeline stage writes its output as a directory of parquet part files,
atomically (write to ``<dir>.tmp``, rename), and records a manifest
entry keyed by a fingerprint of (stage name, parameters, input
fingerprint). A re-run with the same fingerprint reads the parquet back
instead of recomputing; a changed fingerprint invalidates the stage and
everything after it. The manifest stores row counts, per-file lineage
and wall-time metrics for each completed stage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import ray.data as rd


def fingerprint(obj) -> str:
    return hashlib.sha256(json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "manifest.json")
        os.makedirs(root, exist_ok=True)
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f)
        else:
            self.entries = {}

    def _save(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def completed(self, stage: str, fp: str) -> bool:
        e = self.entries.get(stage)
        return bool(e) and e.get("fingerprint") == fp and os.path.isdir(self.stage_dir(stage))

    def run_stage(self, stage: str, fp: str, build) -> rd.Dataset:
        """Return the stage dataset, recomputing only when the fingerprint
        is new. ``build()`` must return a Dataset; its output is persisted
        to parquet part files (the per-partition units a rerun skips)."""
        out_dir = self.stage_dir(stage)
        if self.completed(stage, fp):
            return rd.read_parquet(out_dir)
        t0 = time.time()
        ds = build()
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ds.write_parquet(tmp_dir)
        shutil.rmtree(out_dir, ignore_errors=True)
        os.replace(tmp_dir, out_dir)
        files = sorted(os.listdir(out_dir))
        import pyarrow.parquet as pq

        lineage = []
        rows = 0
        for fn in files:
            md = pq.ParquetFile(os.path.join(out_dir, fn)).metadata
            lineage.append({"file": fn, "rows": md.num_rows})
            rows += md.num_rows
        self.entries[stage] = {
            "fingerprint": fp,
            "rows": rows,
            "files": lineage,
            "wall_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        self._save()
        return rd.read_parquet(out_dir)
