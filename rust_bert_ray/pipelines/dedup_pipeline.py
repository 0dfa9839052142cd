"""Resumable corpus-deduplication pipeline (training-data keep-list).

The LLM-data counterpart of ``run_kg_pipeline``: same per-partition
checkpoint/lineage contract (pipelines.checkpoint), three stages:

    stage A  (per input-file group, embarrassingly parallel, resumable):
        docs → MinHash banded rows → ``banded/part=K`` parquet
        (the exchange payload is persisted, NOT the text — each row is
        (band, band_hash, doc_id, uint16 signature) ≈ 150 B)
    stage B  (global, one all-to-all over the banded checkpoints):
        banded → candidate pairs → connected components →
        ``labels`` parquet: (doc_id, cluster_id, keep) for clustered
        docs (the duplicate minority)
    stage C  (per input-file group, resumable):
        each group's docs anti-joined against the broadcast drop-list →
        ``corpus_dedup/part=K`` parquet

Kill the process anywhere; a rerun skips completed partitions via
``checkpoints/part=K/manifest.json``.  Any stage-A recompute (or an
input regrouping) invalidates stage B and C, exactly as in kg.py.

At 10^12 docs this is the shape that holds: stage A streams each shard
once and writes ~150 B/doc/band; stage B's shuffle is over the banded
rows only; stage C streams each shard once more against a broadcast
drop-list (duplicates are the minority — see functions/dedup.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

from rust_bert_ray.functions.dedup import (
    MinHashStage,
    connected_components,
    minhash_pairs_from_banded,
)
from rust_bert_ray.pipelines import checkpoint as ckpt
from rust_bert_ray.pipelines.kg import _input_groups, _pq_rows


class _DropByIds:
    """Anti-join a batch against a broadcast sorted id array.

    Holds only the ``ray.put`` ref when pickled; the array resolves from
    the object store LAZILY in the first ``__call__`` on each worker —
    instantiating on the driver must not bake the array into the task
    closure (that would defeat the broadcast)."""

    def __init__(self, ref):
        self.ref = ref
        self._drop = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._drop is None:
            self._drop = (
                ray.get(self.ref) if isinstance(self.ref, ray.ObjectRef) else self.ref
            )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, self._drop)))


def run_dedup_pipeline(
    input_path: str,
    out_dir: str,
    *,
    threshold: float = 0.7,
    n_perm: int = 64,
    n_bands: int = 16,
    n_groups: int = 4,
    batch_size: int | None = None,  # None → one task per block (an explicit size becomes a min-rows-per-task bundle and throttles parallelism)
    resume: bool = True,
) -> dict:
    """Run (or resume) the dedup keep-list pipeline; returns summary."""
    t0 = time.time()
    groups = _input_groups(input_path, n_groups)
    summary: dict = {"partitions": [], "resumed": [], "input_rows": 0}
    # params recorded in every manifest: a rerun with different sketch
    # parameters must RECOMPUTE, not silently serve the old keep-list
    params = {
        "threshold": threshold, "n_perm": n_perm, "n_bands": n_bands,
    }

    # ---- stage A: banded signatures per input group (checkpointed) ----
    for part, files in enumerate(groups):
        if resume and ckpt.is_partition_complete(out_dir, part):
            manifest = ckpt.read_manifest(out_dir, part)
            if (
                manifest.get("input_files") == files
                and manifest.get("metrics", {}).get("params") == params
            ):
                summary["resumed"].append(part)
                summary["input_rows"] += manifest["input_rows"]
                continue
            summary.setdefault("invalidated", []).append(part)
        tp = time.time()
        docs = ray.data.read_parquet(files, columns=["doc_id", "text"])
        banded = docs.map_batches(
            MinHashStage(n_perm=n_perm, n_bands=n_bands),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        banded_dir = ckpt.partition_dir(out_dir, "banded", part)
        ckpt.atomic_write_parquet(banded, banded_dir)
        banded_rows = _pq_rows(banded_dir)
        input_rows = banded_rows // n_bands
        ckpt.write_manifest(
            out_dir,
            part,
            input_files=files,
            input_rows=input_rows,
            output_rows={"banded": banded_rows},
            lineage=[
                {
                    "stage": "minhash_band",
                    "input_digest": ckpt.digest(*files, input_rows),
                    "output_digest": ckpt.digest(banded_dir, banded_rows),
                }
            ],
            metrics={"sec": time.time() - tp, "params": params},
        )
        summary["partitions"].append(part)
        summary["input_rows"] += input_rows

    # ---- staleness: any stage-A recompute/regroup invalidates B and C ----
    ckpt.invalidate_downstream(
        out_dir,
        ["banded", "corpus_dedup"],
        {f"part={p}" for p in range(len(groups))},
        bool(summary["partitions"]) or bool(summary.get("invalidated")),
    )
    # a final manifest produced with different parameters is also stale
    if ckpt.is_partition_complete(out_dir, "final"):
        final = ckpt.read_manifest(out_dir, "final")
        if final.get("metrics", {}).get("params") != params:
            os.remove(ckpt.manifest_path(out_dir, "final"))

    # ---- stage B + C: pairs → CC → labels; per-group filtered corpus ----
    if not (resume and ckpt.is_partition_complete(out_dir, "final")):
        tb = time.time()
        banded_all = ray.data.read_parquet(os.path.join(out_dir, "banded"))
        pairs = minhash_pairs_from_banded(
            banded_all, threshold=threshold, n_perm=n_perm, n_bands=n_bands
        )
        labels = connected_components(pairs)
        labels_dir = ckpt.partition_dir(out_dir, "labels", 0)

        def with_keep(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            cl = t.column("cluster_id").to_numpy(zero_copy_only=False)
            return t.append_column(
                "keep", pa.array((ids == cl).astype(np.int64))
            )

        ckpt.atomic_write_parquet(
            labels.map_batches(with_keep, batch_format="pyarrow"), labels_dir
        )

        # drop-list = clustered docs that are not their cluster's minimum
        # (an all-unique corpus yields a file-less labels dir → empty list)
        import glob as _glob

        import pyarrow.dataset as pads

        label_files = _glob.glob(os.path.join(labels_dir, "*.parquet"))
        if label_files:
            lab = pads.dataset(label_files).to_table(columns=["doc_id", "keep"])
            drop_ids = np.sort(
                lab.column("doc_id").to_numpy(zero_copy_only=False)[
                    lab.column("keep").to_numpy(zero_copy_only=False) == 0
                ]
            )
        else:
            drop_ids = np.empty(0, dtype=np.int64)
        drop_ref = ray.put(drop_ids)

        kept_rows = 0
        for part, files in enumerate(groups):
            docs = ray.data.read_parquet(files)
            out_part = ckpt.partition_dir(out_dir, "corpus_dedup", part)
            ckpt.atomic_write_parquet(
                docs.map_batches(
                    _DropByIds(drop_ref), batch_format="pyarrow",
                    batch_size=65536,
                ),
                out_part,
            )
            kept_rows += _pq_rows(out_part)
        ckpt.write_manifest(
            out_dir,
            "final",
            input_files=[os.path.join(out_dir, "banded")],
            input_rows=summary["input_rows"],
            output_rows={
                "labels": _pq_rows(labels_dir),
                "dropped": int(len(drop_ids)),
                "corpus_dedup": kept_rows,
            },
            lineage=[
                {
                    "stage": "pairs_cc_filter",
                    "input_digest": ckpt.digest(out_dir, "banded"),
                    "output_digest": ckpt.digest(kept_rows, len(drop_ids)),
                }
            ],
            metrics={"sec": time.time() - tb, "params": params},
        )
        summary["dropped"] = int(len(drop_ids))
        summary["kept_rows"] = kept_rows
    else:
        summary["resumed"].append("final")
        final = ckpt.read_manifest(out_dir, "final")
        summary["dropped"] = final["output_rows"]["dropped"]
        summary["kept_rows"] = final["output_rows"]["corpus_dedup"]

    summary["total_sec"] = time.time() - t0
    return summary


def _main() -> None:
    """Job entrypoint: ``ray job submit -- python -m
    rust_bert_ray.pipelines.dedup_pipeline INPUT_DIR OUT_DIR [...]``."""
    import argparse
    import json

    p = argparse.ArgumentParser(description="corpus dedup keep-list pipeline")
    p.add_argument("input_dir")
    p.add_argument("out_dir")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--n-groups", type=int, default=4)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()
    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    print(
        json.dumps(
            run_dedup_pipeline(
                args.input_dir,
                args.out_dir,
                threshold=args.threshold,
                n_groups=args.n_groups,
                resume=not args.no_resume,
            )
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    _main()
