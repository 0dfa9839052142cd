"""Per-partition checkpoint manifests with lineage + metrics.

Resumable-output contract (north rule): a run is split into partitions
(groups of input files); each partition writes its outputs to its own
directory *atomically* (write to ``<dir>.tmp``, rename) and then records a
``manifest.json`` with row counts, lineage digests and timings.  A re-run
skips partitions whose manifest exists — kill the process at any point and
the next invocation continues where it left off.

Layout (FIXTURES.md §4):

    <out_dir>/<table>/part=K/*.parquet
    <out_dir>/checkpoints/part=K/manifest.json
    <out_dir>/checkpoints/final/manifest.json
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib


def partition_dir(out_dir: str, table: str, part: int | str) -> str:
    return os.path.join(out_dir, table, f"part={part}")


def manifest_path(out_dir: str, part: int | str) -> str:
    return os.path.join(out_dir, "checkpoints", f"part={part}", "manifest.json")


def is_partition_complete(out_dir: str, part: int | str) -> bool:
    return os.path.exists(manifest_path(out_dir, part))


def digest(*items) -> str:
    """Cheap, deterministic lineage digest."""
    return f"{zlib.crc32('|'.join(str(i) for i in items).encode()):08x}"


def write_manifest(
    out_dir: str,
    part: int | str,
    *,
    input_files: list[str],
    input_rows: int,
    output_rows: dict[str, int],
    lineage: list[dict],
    metrics: dict,
) -> None:
    path = manifest_path(out_dir, part)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "partition_id": part,
                "input_files": input_files,
                "input_rows": input_rows,
                "output_rows": output_rows,
                "lineage": lineage,
                "metrics": metrics,
                "completed_at": time.time(),
            },
            f,
            indent=1,
        )
    os.replace(tmp, path)


def read_manifest(out_dir: str, part: int | str) -> dict:
    with open(manifest_path(out_dir, part)) as f:
        return json.load(f)


def atomic_write_parquet(ds, target_dir: str) -> None:
    """write_parquet into a temp dir, then rename into place.

    The tmp dir is pre-created: Ray's write_parquet of an EMPTY dataset
    writes no files and creates no directory, which would make the
    rename fail — an empty (zero-file) checkpoint dir is valid output.
    """
    tmp = target_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.replace(tmp, target_dir)


def invalidate_downstream(
    out_dir: str,
    tables: list[str],
    valid_parts: set[str],
    recomputed: bool,
) -> bool:
    """Shared stage-B/C staleness handling for checkpointed pipelines.

    Removes part dirs not in ``valid_parts`` (orphans from an older input
    grouping) under each table and under ``checkpoints/``; if anything was
    recomputed or orphaned, the ``final`` manifest is deleted so the
    downstream global stage re-runs.  Ordering matters: the final
    manifest is invalidated BEFORE the orphan dirs that indict it are
    removed — a crash in between must leave downstream marked stale,
    never the reverse.  Returns the updated ``recomputed`` flag.
    """
    keep = {"part=final"} | valid_parts

    def orphans(root: str) -> list[str]:
        if not os.path.isdir(root):
            return []
        return [
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("part=") and d not in keep
        ]

    orphan_dirs = [p for table in tables for p in orphans(os.path.join(out_dir, table))]
    recomputed = recomputed or bool(orphan_dirs)
    if recomputed and is_partition_complete(out_dir, "final"):
        os.remove(manifest_path(out_dir, "final"))
    for p in orphan_dirs + orphans(os.path.join(out_dir, "checkpoints")):
        shutil.rmtree(p)
    return recomputed


def completed_partitions(out_dir: str) -> list[str]:
    root = os.path.join(out_dir, "checkpoints")
    if not os.path.isdir(root):
        return []
    return sorted(
        d.split("=", 1)[1] for d in os.listdir(root) if d.startswith("part=")
    )
