"""Source/sink abstraction for the engine's table formats.

The north_star input is a Lance table of interleaved documents
(BASELINE.json ``input_hint``); this environment has no ``lance``
library, so Parquet is the tested stand-in and the Lance entry points
are thin, import-gated wrappers that slot into the same call sites —
a deployment with ``pylance`` installed gets the real readers without
touching any pipeline code.

Readers return a ``ray.data.Dataset``; writers consume one. Both write
partitioned output (one file per block) so a failed run can resume by
skipping completed partitions (see state/checkpoint.py).
"""

from __future__ import annotations

import ray.data as rd

_FORMATS = ("parquet", "lance", "csv", "json")


def read_table(path: str, *, format: str = "parquet", columns=None, **kwargs) -> rd.Dataset:
    """Read a table as a streaming Dataset. ``columns`` prunes at the
    read (only requested columns leave storage). csv/json cover the
    reference's data.frame-from-flat-file workflows; they can't prune
    at the read, so the projection happens right after."""
    if format == "parquet":
        return rd.read_parquet(path, columns=columns, **kwargs)
    if format == "csv":
        ds = rd.read_csv(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if format == "json":
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if format == "lance":
        try:
            return rd.read_lance(path, columns=columns, **kwargs)
        except (ImportError, AttributeError) as e:  # pragma: no cover - env has no lance
            raise ImportError(
                "reading Lance requires the 'pylance' package, which is not "
                "installed in this environment; use format='parquet'"
            ) from e
    raise ValueError(f"unknown format {format!r}; expected one of {_FORMATS}")


def write_partitioned(
    ds: rd.Dataset,
    path: str,
    by: list[str],
    *,
    mode: str = "overwrite",
    **kwargs,
) -> None:
    """Hive-partitioned parquet output: one ``col=value/`` directory per
    distinct key tuple of ``by`` (e.g. ``lang=en/``), many files per
    partition. This is the resumable layout for 100 TB runs — a rerun
    can list the finished ``col=value`` directories and skip them, and
    downstream readers prune whole directories with partition filters
    (``read_parquet(path)`` reconstructs the key columns from the
    paths). Key columns should be low-cardinality (a directory per
    distinct tuple)."""
    if not by:
        raise ValueError("by must name at least one partition column")
    ds.write_parquet(path, partition_cols=list(by), mode=mode, **kwargs)


def write_table(ds: rd.Dataset, path: str, *, format: str = "parquet", **kwargs) -> None:
    """Write a Dataset as partitioned files (never one giant file)."""
    if format == "parquet":
        ds.write_parquet(path, **kwargs)
        return
    if format == "csv":
        ds.write_csv(path, **kwargs)
        return
    if format == "json":
        ds.write_json(path, **kwargs)
        return
    if format == "lance":
        try:
            ds.write_lance(path, **kwargs)
        except (ImportError, AttributeError) as e:  # pragma: no cover - env has no lance
            raise ImportError(
                "writing Lance requires the 'pylance' package, which is not "
                "installed in this environment; use format='parquet'"
            ) from e
        return
    raise ValueError(f"unknown format {format!r}; expected one of {_FORMATS}")
