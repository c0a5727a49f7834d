"""Checkpoint manifests for resumable pipelines — stage-granular and
PARTITION-granular.

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule):

- :meth:`Manifest.run_stage` — whole-stage unit: the stage's output is
  persisted as a parquet directory atomically (write ``<dir>.tmp``,
  rename) under a fingerprint of (stage name, parameters, input
  fingerprint); a rerun with the same fingerprint reads it back.
- :meth:`Manifest.run_stage_partitioned` — partition-granular: the
  stage's output is split into ``num_partitions`` DETERMINISTIC
  partitions; each partition is written as its own parquet file
  atomically INSIDE the shuffle task (tmp + rename, fingerprint in the
  filename). A run killed mid-stage leaves its completed partition
  files behind; the next run scans them, asks the builder for ONLY the
  missing partition ids (so upstream compute is skipped for completed
  partitions when the builder can push the filter down — e.g. the
  blocked join filters whole blocks out of the shuffle), and merges
  per-partition lineage + metrics into the manifest.

The manifest stores row counts, per-file / per-partition lineage and
wall-time metrics for each completed stage. Scale note: part files are
renamed within one filesystem; on a multi-node cluster the checkpoint
root must be shared storage (or an object store with atomic
single-object commit, which S3-style PUT provides).
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

    # ------------------------------------------------- partition-granular

    @staticmethod
    def _part_file(part: int, fp: str) -> str:
        return f"part-{part:05d}-{fp}.parquet"

    def scan_parts(self, stage: str, fp: str, num_partitions: int) -> set[int]:
        """Partitions already durable for this fingerprint: a part file
        written by a previous (possibly killed) run, or a manifest record
        of an empty partition. Files from other fingerprints are purged."""
        out_dir = self.stage_dir(stage)
        os.makedirs(out_dir, exist_ok=True)
        done: set[int] = set()
        for fn in os.listdir(out_dir):
            if not fn.startswith("part-"):
                continue
            stem = fn[:-len(".parquet")] if fn.endswith(".parquet") else fn
            bits = stem.split("-")
            if len(bits) == 3 and bits[2] == fp and not fn.endswith(".tmp"):
                done.add(int(bits[1]))
            else:  # stale fingerprint or leftover tmp
                os.remove(os.path.join(out_dir, fn))
        e = self.entries.get(stage)
        if e and e.get("fingerprint") == fp:
            for p, info in e.get("partitions", {}).items():
                if info.get("rows") == 0:
                    done.add(int(p))
        return {p for p in done if p < num_partitions}

    def run_stage_partitioned(
        self,
        stage: str,
        fp: str,
        num_partitions: int,
        build_parts,
        part_col: str = "__ckpt_part",
        empty_schema=None,
    ) -> rd.Dataset:
        """Partition-granular stage (see module doc). ``build_parts(missing)``
        must return a Dataset holding ONLY rows whose deterministic
        partition id (int64 column ``part_col`` in [0, num_partitions))
        is in ``missing``. Each partition becomes one atomically-renamed
        parquet file; completed partitions survive a mid-stage kill and
        are skipped — including their upstream compute when the builder
        pushes the partition filter down."""
        out_dir = self.stage_dir(stage)
        done = self.scan_parts(stage, fp, num_partitions)
        missing = sorted(set(range(num_partitions)) - done)
        prev = self.entries.get(stage)
        parts_meta: dict = (
            dict(prev.get("partitions", {})) if prev and prev.get("fingerprint") == fp else {}
        )
        t0 = time.time()
        if missing:
            ds = build_parts(missing)
            pf = self._part_file

            def write_part(t, _dir=out_dir, _fp=fp, _pc=part_col):
                import pyarrow as pa
                import pyarrow.parquet as pq

                tw0 = time.time()
                part = int(t.column(_pc)[0].as_py())
                body = t.drop_columns([_pc])
                final = os.path.join(_dir, pf(part, _fp))
                tmp = final + f".{os.getpid()}.tmp"
                pq.write_table(body, tmp)
                os.replace(tmp, final)
                return pa.table(
                    {
                        "part": pa.array([part], pa.int64()),
                        "rows": pa.array([body.num_rows], pa.int64()),
                        "wall_sec": pa.array([round(time.time() - tw0, 3)], pa.float64()),
                    }
                )

            receipts = (
                ds.groupby(part_col)
                .map_groups(write_part, batch_format="pyarrow")
                .take_all()
            )
            got = {r["part"] for r in receipts}
            for r in receipts:
                parts_meta[str(r["part"])] = {
                    "rows": r["rows"],
                    "file": pf(r["part"], fp),
                    "wall_sec": r["wall_sec"],
                }
            for p in missing:  # partitions with zero rows produce no group
                if p not in got:
                    parts_meta[str(p)] = {"rows": 0, "file": None, "wall_sec": 0.0}
        # partitions completed by a previous killed run have files but no
        # manifest record yet — backfill lineage from parquet metadata
        import pyarrow.parquet as pq

        for p in sorted(done):
            if str(p) not in parts_meta:
                f = os.path.join(out_dir, self._part_file(p, fp))
                parts_meta[str(p)] = {
                    "rows": pq.ParquetFile(f).metadata.num_rows,
                    "file": self._part_file(p, fp),
                    "wall_sec": None,
                }
        rows = sum(int(v["rows"]) for v in parts_meta.values())
        entry = {
            "fingerprint": fp,
            "rows": rows,
            "num_partitions": num_partitions,
            "partitions": parts_meta,
            "resumed_parts": sorted(done),
            "wall_sec": round(time.time() - t0, 3),
            "completed_at": (
                prev.get("completed_at")
                if prev and prev.get("fingerprint") == fp and not missing
                else time.strftime("%Y-%m-%dT%H:%M:%S")
            ),
        }
        self.entries[stage] = entry
        self._save()
        files = [
            os.path.join(out_dir, v["file"])
            for _, v in sorted(parts_meta.items(), key=lambda kv: int(kv[0]))
            if v["file"]
        ]
        if not files:
            import pyarrow as pa

            sch = empty_schema if empty_schema is not None else pa.schema([])
            return rd.from_arrow(sch.empty_table())
        return rd.read_parquet(files)
