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
    """write_parquet into a temp dir, then rename into place."""
    tmp = target_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(os.path.dirname(target_dir) or ".", exist_ok=True)
    ds.write_parquet(tmp)
    if os.path.exists(target_dir):
        shutil.rmtree(target_dir)
    os.replace(tmp, target_dir)


def completed_partitions(out_dir: str) -> list[str]:
    root = os.path.join(out_dir, "checkpoints")
    if not os.path.isdir(root):
        return []
    return sorted(
        d.split("=", 1)[1] for d in os.listdir(root) if d.startswith("part=")
    )
