"""End-to-end knowledge-graph construction pipeline (the flagship).

Architecture (SURVEY.md §7.1), Ray-Data-first:

    read_parquet(docs, columns=[doc_id, spans])          # prune at the read
      → map_batches(NerStage,      actor pool)           # NER + BIO decode
      → map_batches(RelationStage, actor pool)           # entity-pair → triple candidates
      → map_batches(LinkingStage,  actor pool)           # broadcast alias/embedding index
      → [checkpoint: triples + enriched docs per input-file group]
    then, over all checkpointed triples:
      → build_nodes  (combiner → salted groupby → union-find collapse)
      → build_edges  (combiner → salted groupby → dedup)
      → write nodes/edges (atomic)

Stage A (extract→link) is embarrassingly parallel and is checkpointed per
input-file group: each group is its own bounded Ray Data job whose outputs
land atomically with a lineage manifest; a killed run resumes by skipping
completed groups.  Input partitioning: each corpus shard holds a
contiguous doc_id range written at ingest (hash(doc_id) partitioning is
equivalent here because doc ids are uniform); no repartition shuffle is
spent on the map-only path, and key skew is handled downstream where keys
actually exist (salted bucketed merges in canonicalize).  Stage B is the global shuffle; it reads the
checkpointed triples back (streaming) so a resume never recomputes
extraction.

Per-row invariant: the ``spans`` column flows through NerStage untouched
and is written back out in ``docs_enriched`` — byte-for-byte the input
span sequence (kind, text, media_ref, order), per BASELINE.json.
"""

from __future__ import annotations

import glob
import os
import time

import ray
import ray.data


def _pq_rows(path: str) -> int:
    """Row count from parquet metadata (no Ray job, no data read)."""
    import pyarrow.dataset as pads

    return pads.dataset(path).count_rows()

from rust_bert_ray.corpus import GAZETTEER, VARIANTS
from rust_bert_ray.pipelines import checkpoint as ckpt
from rust_bert_ray.stages.canonicalize import build_edges, build_nodes
from rust_bert_ray.stages.linking import AliasIndex, LinkingStage
from rust_bert_ray.stages.ner import NerStage, RelationStage


def default_alias_index() -> AliasIndex:
    """Index over the corpus gazetteer; VARIANTS resolve via the ANN path
    (they are deliberately not exact aliases)."""
    entities = {s: k for s, k in GAZETTEER.items() if s not in VARIANTS}
    return AliasIndex(entities)


def _sum_pool_budget(concurrency: int | None) -> int:
    """CPU budget available to actor pools (total − read/write reserve)."""
    if concurrency is None:
        try:
            total = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            total = 8
    else:
        total = concurrency
    return max(3, total - 2)


def _pool_sizes(concurrency: int | None) -> tuple[int, int, int]:
    """Split the CPU budget across the three actor pools.

    NER dominates wall time → ~60% of the budget; relation and linking are
    cheap per row → ~20% each.  Sized so Σ(pool × num_cpus=1) ≈ node CPUs
    and no stage starves the read/write stages.

    (Leaving ≥2 CPUs for the task-based read/write stages is load-bearing:
    an actor-pool sum equal to the node's CPUs starves ReadParquet and the
    pipeline deadlocks — observed; also the guide's "pool that reserves
    every CPU" pitfall.)
    """
    budget = _sum_pool_budget(concurrency)
    ner = max(1, (budget * 6) // 10)
    rel = max(1, (budget * 2) // 10)
    link = max(1, budget - ner - rel)
    return ner, rel, link


def extract_and_link(
    docs: "ray.data.Dataset",
    *,
    gazetteer: dict[str, str] | None = None,
    index_ref=None,
    batch_size: int | None = None,
    concurrency: int | None = None,
    ner_ray_remote_args: dict | None = None,
    ner_stage_kwargs: dict | None = None,
) -> "ray.data.Dataset":
    """docs → linked triple candidates (no shuffle anywhere).

    ``ner_stage_kwargs`` merges into NerStage's constructor — the
    backend-swap hook (e.g. ``{"scorer": TensorTagScorer(gaz)}`` for the
    batched-tensor/GPU path; the reference's ModelResource::ONNX slot,
    token_classification.rs:355-361).

    ``ner_ray_remote_args`` flows to the NER actor pool's scheduling —
    a GPU-backed scorer uses ``ner_ray_remote_args={"num_gpus": 1}``
    TOGETHER with ``concurrency=<number of GPUs>`` (one model replica
    per GPU; the default CPU-derived pool size would leave most actors
    pending on the GPU resource).  Decode algebra, batch flow and
    shuffle topology are unchanged by the device swap.
    """
    gaz = gazetteer if gazetteer is not None else GAZETTEER
    if index_ref is None:
        index_ref = ray.put(default_alias_index())
    # Only NER is an actor pool (stateful: compiled gazetteer, memo, and
    # the GPU seam).  Relation + linking are CHEAP vectorized passes with
    # trivial state (fact: per-task overhead, not UDF time, dominated
    # them as actor pools) — as task-pool INSTANCES they float over
    # whatever CPUs NER isn't using, so no static split can starve the
    # read/write stages at any cluster size.  NER gets ~2/3 of the
    # budget: its UDF time ≈ 60% of the stream's total CPU (measured
    # 99 / 165 CPU·s at 800k docs).
    ner_c = max(1, (_sum_pool_budget(concurrency) * 2) // 3)
    enriched = docs.map_batches(
        NerStage,
        fn_constructor_kwargs={"gazetteer": gaz, **(ner_stage_kwargs or {})},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=ner_c,
        **(ner_ray_remote_args or {}),
    )
    triples = enriched.map_batches(
        RelationStage(),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    linked = triples.map_batches(
        LinkingStage(index_ref),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return linked


def enrich_docs(
    docs: "ray.data.Dataset",
    *,
    gazetteer: dict[str, str] | None = None,
    batch_size: int | None = None,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """docs → docs + entities (spans untouched) — the invariant-bearing output."""
    gaz = gazetteer if gazetteer is not None else GAZETTEER
    ner_c, _, _ = _pool_sizes(concurrency)
    return docs.map_batches(
        NerStage,
        fn_constructor_kwargs={"gazetteer": gaz},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=ner_c,
    )


def _input_groups(input_path: str, n_groups: int) -> list[list[str]]:
    if os.path.isdir(input_path):
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    else:
        files = [input_path]
    if not files:
        raise FileNotFoundError(f"no parquet under {input_path}")
    n_groups = max(1, min(n_groups, len(files)))
    return [files[i::n_groups] for i in range(n_groups)]


def run_kg_pipeline(
    input_path: str,
    out_dir: str,
    *,
    gazetteer: dict[str, str] | None = None,
    alias_index: AliasIndex | None = None,
    batch_size: int | None = None,
    concurrency: int | None = None,
    n_groups: int = 4,
    salt: int = 8,
    write_enriched: bool = True,
    resume: bool = True,
) -> dict:
    """Run (or resume) the full pipeline; returns summary metrics."""
    t0 = time.time()
    index_ref = ray.put(alias_index if alias_index is not None else default_alias_index())
    groups = _input_groups(input_path, n_groups)
    summary = {"partitions": [], "resumed": [], "input_rows": 0, "triple_rows": 0}

    for part, files in enumerate(groups):
        if resume and ckpt.is_partition_complete(out_dir, part):
            # only skip if the manifest was produced from the SAME input
            # file group — a changed input plan (different sharding,
            # regenerated corpus) must recompute, not silently reuse
            manifest = ckpt.read_manifest(out_dir, part)
            if manifest.get("input_files") == files:
                summary["resumed"].append(part)
                continue
            summary.setdefault("invalidated", []).append(part)
        out_rows = _stage_a_partition(
            files,
            part,
            out_dir,
            gazetteer=gazetteer,
            index_ref=index_ref,
            batch_size=batch_size,
            concurrency=concurrency,
            write_enriched=write_enriched,
        )
        summary["partitions"].append(part)
        summary["input_rows"] += out_rows["input_rows"]
        summary["triple_rows"] += out_rows["triples"]

    return _finish_kg_pipeline(out_dir, groups, summary, resume, salt, t0)


def _stage_a_partition(
    files: list[str],
    part,
    out_dir: str,
    *,
    gazetteer,
    index_ref,
    batch_size,
    concurrency,
    write_enriched: bool,
) -> dict:
    """Extract→link ONE input-file group and checkpoint it atomically
    (triples + optionally enriched docs) under ``part=<part>``.  Shared
    by the full pipeline and the incremental ingest path."""
    tp = time.time()
    # One block per input file unless the NER pool needs more for
    # balance: Ray's default parallelism heuristic splits each file
    # in two (≥200 blocks), and the extra per-block task round-trips
    # through 4 downstream operators cost ~15% wall at 800k docs.
    ner_c = max(1, (_sum_pool_budget(concurrency) * 2) // 3)
    docs = ray.data.read_parquet(
        files,
        columns=["doc_id", "spans"],
        override_num_blocks=max(len(files), 2 * ner_c),
    )
    lineage = []
    out_rows: dict[str, int] = {}
    if write_enriched:
        # FUSED single streaming execution (one NER pass, one ramp):
        #   NER → per-block side-write of the enriched docs (spans
        #   untouched + entities) → relations → linking → triples.
        # Running enrich-write and triple-derive as two sequential
        # datasets paid a second fill/drain ramp and serialized NER
        # against rel+link (21.7 s → fused ~14 s at 800k/32 CPUs).
        # The side-writer spills each NER output BLOCK into the
        # checkpoint tmp dir with a deterministic name (blocks hold
        # disjoint doc ranges → first doc_id identifies the block;
        # a retried task overwrites its own file, so the write is
        # exactly-once); the dir is renamed into place only after
        # the fused pipeline — triples included — finishes.
        docs_dir = ckpt.partition_dir(out_dir, "docs_enriched", part)
        tmp_dir = docs_dir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)

        def spill_enriched(t):
            import pyarrow.parquet as pq

            if t.num_rows:
                name = f"blk-{t.column('doc_id')[0].as_py()}-{t.num_rows}"
                pq.write_table(t, os.path.join(tmp_dir, name + ".parquet"))
            return t

        # Same stage topology as extract_and_link: NER is the only
        # actor pool (~2/3 budget — its UDF time is ~60% of the
        # stream's CPU); spill + relation + linking run as task-pool
        # stages that Ray fuses into one operator and schedules onto
        # whatever CPUs NER isn't using.  Static 3-pool splits were
        # measured 40-70% slower at 800k docs/32 CPUs and starve
        # worse at small CPU counts (the 8-CPU scaling leg).
        enriched = docs.map_batches(
            NerStage,
            fn_constructor_kwargs={"gazetteer": gazetteer or GAZETTEER},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=ner_c,
        ).map_batches(
            spill_enriched, batch_format="pyarrow", batch_size=None
        )
        downstream = enriched.map_batches(
            RelationStage(),
            batch_format="pyarrow",
            batch_size=batch_size,
        ).map_batches(
            LinkingStage(index_ref),
            batch_format="pyarrow",
            batch_size=4096,
        )
    else:
        input_rows = docs.count()
        downstream = extract_and_link(
            docs,
            gazetteer=gazetteer,
            index_ref=index_ref,
            batch_size=batch_size,
            concurrency=concurrency,
        )
    triples_dir = ckpt.partition_dir(out_dir, "triples", part)
    ckpt.atomic_write_parquet(downstream, triples_dir)
    if write_enriched:
        # promote the side-written enriched blocks (upstream of the
        # finished triples write ⇒ all spills are complete)
        import shutil

        if os.path.exists(docs_dir):
            shutil.rmtree(docs_dir)
        os.replace(tmp_dir, docs_dir)
        input_rows = _pq_rows(docs_dir)
        out_rows["docs_enriched"] = input_rows
        lineage.append(
            {
                "stage": "enrich_docs",
                "input_digest": ckpt.digest(*files, input_rows),
                "output_digest": ckpt.digest(docs_dir, input_rows),
            }
        )
    out_rows["triples"] = _pq_rows(triples_dir)
    lineage.append(
        {
            "stage": "extract_and_link",
            "input_digest": ckpt.digest(*files, input_rows),
            "output_digest": ckpt.digest(triples_dir, out_rows["triples"]),
        }
    )
    ckpt.write_manifest(
        out_dir,
        part,
        input_files=files,
        input_rows=input_rows,
        output_rows=out_rows,
        lineage=lineage,
        metrics={"sec": time.time() - tp},
    )
    out_rows["input_rows"] = input_rows
    return out_rows


def _ensure_fsspec_stub() -> None:
    """Concurrent Datasets race on fsspec's lazy http import when
    aiohttp is absent (Ray's _is_http_filesystem catches only
    ModuleNotFoundError; the losing thread sees a partially
    initialized module → bare ImportError).  Register a stub module
    so the import is deterministic — HTTP filesystems are never
    used by this pipeline."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import sys as _sys
        import types as _types

        _stub = _types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:  # never instantiated
            pass

        _stub.HTTPFileSystem = _NoHTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = _stub


def _finish_kg_pipeline(
    out_dir, groups, summary, resume, salt, t0, sweep_orphans: bool = True
) -> dict:
    """Stage-B staleness handling + global canonicalize (run_kg_pipeline
    tail, split out so the loop above reads linearly and the ingest path
    can share stage B).  ``sweep_orphans=False`` (the ingest path) skips
    the orphan sweep entirely — an ingest only APPENDS partitions, it
    never redefines the valid base set, and its caller has already
    invalidated the final manifest when new triples landed."""
    if sweep_orphans:
        # ---- stage-B staleness: nodes/edges derive from ALL triples, so
        # any partition recomputed this run (fresh or invalidated) makes
        # an existing final manifest stale; likewise a regrouping
        # (n_groups change) leaves orphaned part dirs from the old
        # grouping that the stage-B glob would silently include.  Drop
        # both before deciding whether stage B may be skipped.  Completed
        # INGEST partitions (``part=ing-*``, see ingest_kg_increment) are
        # appended increments over disjoint doc ids — valid inputs to
        # stage B, never orphans.
        ingest_parts = {
            f"part={p}" for p in ckpt.completed_partitions(out_dir)
            if str(p).startswith("ing-")
        }
        ckpt.invalidate_downstream(
            out_dir,
            ["triples", "docs_enriched"],
            {f"part={p}" for p in range(len(groups))} | ingest_parts,
            bool(summary["partitions"]) or bool(summary.get("invalidated")),
        )

    # ---- stage B: global canonicalize + materialize (reads checkpoints) ----
    if not (resume and ckpt.is_partition_complete(out_dir, "final")):
        tb = time.time()
        # nodes and edges are independent shuffles over the checkpointed
        # triples — run both streaming executions concurrently
        from concurrent.futures import ThreadPoolExecutor

        _ensure_fsspec_stub()

        def _write_nodes():
            ds_ = ray.data.read_parquet(os.path.join(out_dir, "triples"))
            ckpt.atomic_write_parquet(
                build_nodes(ds_, salt=salt), ckpt.partition_dir(out_dir, "nodes", 0)
            )

        def _write_edges():
            ds_ = ray.data.read_parquet(os.path.join(out_dir, "triples"))
            ckpt.atomic_write_parquet(
                build_edges(ds_, salt=salt), ckpt.partition_dir(out_dir, "edges", 0)
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(_write_nodes), pool.submit(_write_edges)]
            for f in futs:
                f.result()
        n_nodes = _pq_rows(os.path.join(out_dir, "nodes"))
        n_edges = _pq_rows(os.path.join(out_dir, "edges"))
        ckpt.write_manifest(
            out_dir,
            "final",
            input_files=[os.path.join(out_dir, "triples")],
            input_rows=_pq_rows(os.path.join(out_dir, "triples")),
            output_rows={"nodes": n_nodes, "edges": n_edges},
            lineage=[
                {
                    "stage": "canonicalize_materialize",
                    "input_digest": ckpt.digest(out_dir, "triples"),
                    "output_digest": ckpt.digest(n_nodes, n_edges),
                }
            ],
            metrics={"sec": time.time() - tb},
        )
    else:
        summary["resumed"].append("final")

    summary["total_sec"] = time.time() - t0
    return summary


# ---------------- incremental canonicalize state (ingest stage B) ----------
#
# The ingest path's stage B persists the canonicalize CLUSTER STATE per
# bucket (nodes: one merged row per (node_id, surface_key); edges: one per
# (subj, pred, obj) — both linear in distinct keys, not mentions) plus the
# finalized per-bucket output rows, hive-partitioned by the final bucket:
#
#   out_dir/state/current.json            → {"dir": "v-<tag>", "covers":
#                                            {partition: manifest-crc}}
#   out_dir/state/v-<tag>/nodes_state/bucket=K/*.parquet
#   out_dir/state/v-<tag>/nodes_out/bucket=K/*.parquet   (+ edges_*)
#
# An ingest computes state partials over the INCREMENT's triples only,
# merges them into the buckets they touch (every canonicalize merge is
# associative+commutative, so bucket-state ∪ increment-partials ≡ a full
# rebuild — asserted by test_kg_ingest's ingest≡rebuild equality),
# re-finalizes only those buckets, and hard-links every untouched bucket's
# state and output files from the previous state version.  Stage-B ingest
# cost therefore scales with the increment and its touched buckets, not
# with total triples.  ``covers`` fingerprints each triples partition's
# manifest bytes — any recomputed/changed partition invalidates the state
# and falls back to a full rebuild (correctness never depends on the
# pointer being fresh).  State versions are immutable dirs landed by
# atomic rename; the pointer flips last, so a crash anywhere leaves the
# previous consistent version in place (re-running the ingest is
# idempotent: same covers → same tag → the completed v-dir is reused).

_NODE_STATE_COLS = [
    "node_id", "surface_key", "canonical", "kind", "n_mentions", "score",
]
_EDGE_STATE_COLS = ["subj_id", "pred", "obj_id", "n_obs", "score", "doc_ids"]


def _state_root(out_dir: str) -> str:
    return os.path.join(out_dir, "state")


def _state_pointer_path(out_dir: str) -> str:
    return os.path.join(_state_root(out_dir), "current.json")


def _triples_partition_fps(out_dir: str) -> dict[str, str]:
    """{triples partition → crc of its manifest bytes} — the state
    validity fingerprint (content-sensitive, not just name-sensitive)."""
    import zlib

    fps: dict[str, str] = {}
    for p in ckpt.completed_partitions(out_dir):
        if str(p) == "final":
            continue
        if not os.path.isdir(ckpt.partition_dir(out_dir, "triples", p)):
            continue
        with open(ckpt.manifest_path(out_dir, p), "rb") as fh:
            fps[str(p)] = f"{zlib.crc32(fh.read()):08x}"
    return fps


def _hive_bucket_to_int(t, col: str = "bucket"):
    """Hive partition values read back as strings/dictionaries — restore
    an int64 ``_bucket`` column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    c = t.column(col)
    if pa.types.is_dictionary(c.type):
        c = pc.cast(c, pa.string())
    b = pc.cast(c, pa.int64())
    idx = t.schema.get_field_index(col)
    return t.remove_column(idx).append_column("_bucket", b)


def _read_state_all(state_table_dir: str):
    """Whole hive-partitioned state table → Dataset with int64 _bucket."""
    ds = ray.data.read_parquet(state_table_dir)
    return ds.map_batches(
        _hive_bucket_to_int, batch_format="pyarrow", batch_size=None
    )


def _read_state_buckets(
    state_table_dir: str, buckets, cols: list[str], n_buckets: int = 32
):
    """ONLY the given buckets' files (partition-pruned read), with the
    bucket recomputed content-side as int64 _bucket.  None if no files
    exist.

    The persisted hive value IS ``crc(key) % n_buckets`` (merge_node_state
    / merge_edge_state reassign ``_bucket`` from row content right before
    the write), so recomputing it lets ALL touched buckets' files flow
    through ONE read + one vectorized map.  The previous shape — one
    read→attach→select Dataset per bucket chained with ``union`` — built
    a ~3·|touched|-operator streaming plan that ran almost serially
    (measured: the 32-bucket nodes merge alone took minutes at <20% CPU)."""
    import pyarrow as pa

    from rust_bert_ray.stages.canonicalize import _crc_bucket

    files: list[str] = []
    for b in sorted({int(x) for x in buckets}):
        files.extend(
            sorted(glob.glob(os.path.join(state_table_dir, f"bucket={b}", "*.parquet")))
        )
    if not files:
        return None
    is_nodes = "node_id" in cols

    def attach(t: pa.Table) -> pa.Table:
        if is_nodes:
            keys = t.column("node_id").to_pandas()
        else:
            df = t.select(["subj_id", "pred", "obj_id"]).to_pandas()
            keys = df["subj_id"] + "|" + df["pred"] + "|" + df["obj_id"]
        b = _crc_bucket(keys, n_buckets)
        return t.append_column("_bucket", pa.array(b, type=pa.int64()))

    return (
        ray.data.read_parquet(files)
        .map_batches(attach, batch_format="pyarrow", batch_size=None)
        .select_columns(cols + ["_bucket"])
    )


def _write_state_hive(ds, target_dir: str) -> None:
    """State/output rows (with _bucket) → hive-partitioned parquet.
    repartition(4) bounds the file count (files = tasks × bucket values —
    the incremental-dedup index lesson)."""

    def to_hive(t):
        return t.rename_columns(
            [("bucket" if c == "_bucket" else c) for c in t.column_names]
        )

    ds.map_batches(to_hive, batch_format="pyarrow", batch_size=None).repartition(
        4
    ).write_parquet(target_dir, partition_cols=["bucket"])


def _finalize_state_to_out(
    state_ds, table: str, target_dir: str, num_partitions: int = 16
) -> None:
    """Per-bucket finalize of state rows → hive-partitioned output rows
    (the ``bucket`` column drives the partitioning and is excluded from
    the files, so assembled outputs carry exactly the nodes/edges schema)."""
    from rust_bert_ray.stages import canonicalize as canon

    fin = canon.finalize_nodes_group if table == "nodes" else canon.finalize_edges_group

    def fin_group(df):
        import pyarrow as pa

        out = fin(df)
        out["bucket"] = int(df["_bucket"].iloc[0])
        # Arrow out: these blocks feed the repartition exchange before
        # the hive write (CLAUDE.md: return Arrow from any map_batches /
        # map_groups feeding a shuffle)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = state_ds.groupby("_bucket", num_partitions=num_partitions).map_groups(
        fin_group, batch_format="pandas"
    )
    out.repartition(4).write_parquet(target_dir, partition_cols=["bucket"])


def _link_buckets(src_root: str, dst_root: str, exclude=()) -> int:
    """Hard-link every bucket dir of ``src_root`` except ``exclude`` into
    ``dst_root`` (untouched buckets carry over at zero compute/IO cost).
    Returns the number of linked buckets."""
    import shutil

    skip = {int(b) for b in exclude}
    n = 0
    for bdir in sorted(glob.glob(os.path.join(src_root, "bucket=*"))):
        b = int(os.path.basename(bdir).split("=", 1)[1])
        if b in skip:
            continue
        dst = os.path.join(dst_root, f"bucket={b}")
        os.makedirs(dst, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
            target = os.path.join(dst, os.path.basename(f))
            try:
                os.link(f, target)
            except OSError:
                shutil.copy2(f, target)
        n += 1
    return n


def _triples_files(out_dir: str, parts) -> list[str]:
    return [
        f
        for p in parts
        for f in sorted(
            glob.glob(
                os.path.join(ckpt.partition_dir(out_dir, "triples", p), "*.parquet")
            )
        )
    ]


def _build_state_dir(
    out_dir: str, tag: str, salt: int, parts: list[str]
) -> str:
    """Full state build over the manifest-complete triples partitions
    (first ingest after a base run, or fallback when the pointer is
    stale).  nodes and edges are independent — built concurrently like
    the base stage B.

    ``parts`` MUST be exactly the partitions the state pointer's
    ``covers`` fingerprint will record: reading the whole triples dir
    instead would bake any unmanifested orphan partition (a crash
    between the atomic dir rename and its manifest write) into state
    OUTSIDE the fingerprint — a later re-ingest of that increment would
    then merge its partials into state that already contains the rows,
    double-counting n_mentions/n_obs with `covers` still valid."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from rust_bert_ray.stages import canonicalize as canon

    new_dir = os.path.join(_state_root(out_dir), f"v-{tag}")
    if os.path.isdir(new_dir):  # completed by a prior (crashed-later) run
        return new_dir
    tmp = new_dir + f".tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    _ensure_fsspec_stub()
    covered_files = _triples_files(out_dir, parts)

    def build(table: str):
        linked = ray.data.read_parquet(covered_files)
        st = (
            canon.node_state(linked, salt=salt)
            if table == "nodes"
            else canon.edge_state(linked, salt=salt)
        )
        state_dir = os.path.join(tmp, f"{table}_state")
        _write_state_hive(st, state_dir)
        _finalize_state_to_out(
            _read_state_all(state_dir), table, os.path.join(tmp, f"{table}_out")
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        for f in [pool.submit(build, t) for t in ("nodes", "edges")]:
            f.result()
    os.replace(tmp, new_dir)
    return new_dir


def _merge_state_increment(
    out_dir: str, old_dir: str, tag: str, new_parts: list[str], salt: int
) -> tuple[str, dict]:
    """Incremental state update: increment partials → merge into touched
    buckets only; untouched buckets (state AND finalized outputs) are
    hard-linked from the previous version."""
    import shutil

    from rust_bert_ray.stages import canonicalize as canon

    new_dir = os.path.join(_state_root(out_dir), f"v-{tag}")
    if os.path.isdir(new_dir):
        return new_dir, {"reused_existing_version": True}
    tmp = new_dir + f".tmp-{os.getpid()}"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    _ensure_fsspec_stub()
    inc_files = _triples_files(out_dir, new_parts)
    stats: dict = {}

    def merge_table(table: str) -> None:
        cols = _NODE_STATE_COLS if table == "nodes" else _EDGE_STATE_COLS
        linked = ray.data.read_parquet(inc_files)
        st = (
            canon.node_state(linked, salt=salt)
            if table == "nodes"
            else canon.edge_state(linked, salt=salt)
        )
        # increment-sized (distinct keys of the increment), safe to pin
        inc_state = st.materialize()
        touched = sorted(
            {
                int(b)
                for b in inc_state.select_columns(["_bucket"]).to_pandas()["_bucket"]
            }
        )
        old_state_dir = os.path.join(old_dir, f"{table}_state")
        merge = (
            canon.merge_node_state
            if table == "nodes"
            else canon.merge_edge_state
        )
        old_touched = _read_state_buckets(old_state_dir, touched, cols)
        merged_in = inc_state.select_columns(cols + ["_bucket"])
        if old_touched is not None:
            merged_in = old_touched.union(merged_in)
        np_ = max(1, min(16, len(touched)))
        # touched-buckets-sized (distinct keys), safe to pin; reused by
        # BOTH the state write and the finalize so the merged rows are
        # never re-read from disk
        merged = merged_in.groupby("_bucket", num_partitions=np_).map_groups(
            merge, batch_format="pandas"
        ).materialize()
        new_state_dir = os.path.join(tmp, f"{table}_state")
        out_dir_t = os.path.join(tmp, f"{table}_out")
        # the state write and the touched-bucket re-finalize both consume
        # the SAME materialized `merged` and are independent — run them
        # concurrently (each is one small Ray execution; the scheduling
        # floor, not data, dominates at small increments)
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=2) as wex:
            f_state = wex.submit(_write_state_hive, merged, new_state_dir)
            if touched:
                f_out = wex.submit(
                    _finalize_state_to_out, merged, table, out_dir_t,
                    num_partitions=np_,
                )
                f_out.result()
            f_state.result()
        n_linked_state = _link_buckets(old_state_dir, new_state_dir, exclude=touched)
        _link_buckets(os.path.join(old_dir, f"{table}_out"), out_dir_t, exclude=touched)
        stats[table] = {
            "touched_buckets": len(touched),
            "linked_buckets": n_linked_state,
        }

    # nodes and edges are independent — run concurrently like the base
    # pipeline's stage B (halves the fixed per-execution overhead)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(merge_table, ("nodes", "edges")))
    os.replace(tmp, new_dir)
    return new_dir, stats


def _write_state_pointer(out_dir: str, dir_name: str, covers: dict) -> None:
    import json
    import shutil

    os.makedirs(_state_root(out_dir), exist_ok=True)
    path = _state_pointer_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"dir": dir_name, "covers": covers}, f, indent=1)
    os.replace(tmp, path)
    # GC superseded state versions (and any stale build temp dirs)
    for d in glob.glob(os.path.join(_state_root(out_dir), "v-*")):
        if os.path.basename(d) != dir_name:
            shutil.rmtree(d, ignore_errors=True)


def _assemble_outputs(out_dir: str, state_dir: str) -> dict[str, int]:
    """Link every bucket's finalized output files into atomically renamed
    nodes/ and edges/ dirs with the SAME ``part=0`` layout the base
    pipeline's stage B writes (readers must see one layout regardless of
    which path produced the table; the bucket lives only in the source
    file path)."""
    import shutil

    counts: dict[str, int] = {}
    for table in ("nodes", "edges"):
        src = os.path.join(state_dir, f"{table}_out")
        target = os.path.join(out_dir, table)
        tmp = target + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        part0 = os.path.join(tmp, "part=0")
        os.makedirs(part0)
        for bdir in sorted(glob.glob(os.path.join(src, "bucket=*"))):
            b = os.path.basename(bdir).split("=", 1)[1]
            for i, f in enumerate(sorted(glob.glob(os.path.join(bdir, "*.parquet")))):
                dst = os.path.join(part0, f"b{b}-{i:03d}.parquet")
                try:
                    os.link(f, dst)
                except OSError:
                    shutil.copy2(f, dst)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.replace(tmp, target)
        counts[table] = _pq_rows(target)
    return counts


def _finish_ingest_state(out_dir: str, summary: dict, salt: int, t0: float) -> dict:
    """Ingest stage B over persisted per-bucket canonicalize state."""
    import json

    if ckpt.is_partition_complete(out_dir, "final"):
        summary["resumed"].append("final")
        summary["total_sec"] = time.time() - t0
        return summary
    tb = time.time()
    fps = _triples_partition_fps(out_dir)
    tag = ckpt.digest(*(f"{k}:{v}" for k, v in sorted(fps.items())))
    ptr = None
    try:
        with open(_state_pointer_path(out_dir), encoding="utf-8") as f:
            ptr = json.load(f)
    except (OSError, ValueError):
        pass
    mode, stats, state_dir = None, None, None
    if ptr and os.path.isdir(os.path.join(_state_root(out_dir), ptr.get("dir", ""))):
        covers = ptr.get("covers", {})
        old_dir = os.path.join(_state_root(out_dir), ptr["dir"])
        valid = set(covers) <= set(fps) and all(
            fps[p] == v for p, v in covers.items()
        )
        new_parts = sorted(set(fps) - set(covers))
        if valid and not new_parts:
            state_dir, mode = old_dir, "reuse"
        elif valid:
            state_dir, stats = _merge_state_increment(
                out_dir, old_dir, tag, new_parts, salt
            )
            mode = "incremental"
    if mode is None:
        state_dir, mode = _build_state_dir(out_dir, tag, salt, sorted(fps)), "full"
    counts = _assemble_outputs(out_dir, state_dir)
    _write_state_pointer(out_dir, os.path.basename(state_dir), fps)
    ckpt.write_manifest(
        out_dir,
        "final",
        input_files=[os.path.join(out_dir, "triples")],
        input_rows=_pq_rows(os.path.join(out_dir, "triples")),
        output_rows={"nodes": counts["nodes"], "edges": counts["edges"]},
        lineage=[
            {
                "stage": "canonicalize_materialize",
                "mode": mode,
                "state": os.path.basename(state_dir),
                "input_digest": ckpt.digest(out_dir, "triples"),
                "output_digest": ckpt.digest(counts["nodes"], counts["edges"]),
            }
        ],
        metrics={"sec": time.time() - tb},
    )
    summary["stage_b"] = {"mode": mode, "sec": time.time() - tb, **(stats or {})}
    summary["total_sec"] = time.time() - t0
    return summary


def ingest_kg_increment(
    increment_path: str,
    out_dir: str,
    *,
    gazetteer: dict[str, str] | None = None,
    alias_index: AliasIndex | None = None,
    batch_size: int | None = None,
    concurrency: int | None = None,
    n_groups: int = 1,
    salt: int = 8,
    write_enriched: bool = True,
) -> dict:
    """Append a new corpus shard to an EXISTING KG output directory.

    The 100-TB operating model: corpora are append-only, and extraction
    (the model-bound cost — NER actor pools over every document) must
    run ONLY over the new shard.  This entry point:

    - runs stage A over the increment's files alone, landing them as
      new checkpoint partitions named ``ing-<digest-of-file-list>-<g>``
      — existing partitions are never read, touched, or invalidated;
    - re-ingesting the SAME increment is a no-op (manifest hit, same
      rule as the base pipeline's resume);
    - runs stage B as a BUCKET-LEVEL INCREMENTAL MERGE against persisted
      per-bucket canonicalize state (see the state section above): the
      increment's state partials are merged into only the node/edge
      buckets they touch and only those buckets are re-finalized;
      untouched buckets' state and output files hard-link across
      versions.  The first ingest against a base run (no state yet)
      builds the state from all checkpointed triples once; any
      recomputed base partition invalidates the state fingerprint and
      falls back to that full build.  Ingest stage-B cost therefore
      scales with the increment and its touched buckets, not with total
      triples.

    Caller contract: increment doc_ids are disjoint from previously
    ingested documents (the same contract an append-only corpus gives
    any ingest system).  ``run_kg_pipeline`` over the BASE input
    recognizes completed ``ing-*`` partitions as valid increments (its
    orphan sweep keeps them); changing the base input still invalidates
    everything, increments included, via the normal full-rebuild path.
    """
    t0 = time.time()
    index_ref = ray.put(
        alias_index if alias_index is not None else default_alias_index()
    )
    groups = _input_groups(increment_path, n_groups)
    inc_tag = ckpt.digest(*(f for g in groups for f in g))
    summary = {
        "partitions": [],
        "resumed": [],
        "input_rows": 0,
        "triple_rows": 0,
        "increment": inc_tag,
    }
    recomputed = False
    for g, files in enumerate(groups):
        part = f"ing-{inc_tag}-{g}"
        if ckpt.is_partition_complete(out_dir, part):
            manifest = ckpt.read_manifest(out_dir, part)
            if manifest.get("input_files") == files:
                summary["resumed"].append(part)
                continue
        # new triples will make the existing nodes/edges stale —
        # invalidate the final manifest BEFORE the inputs that indict it
        # land (checkpoint.py's ordering rule): a crash after this
        # partition's manifest but before a post-loop removal would
        # otherwise resume every partition AND the stale final, leaving
        # nodes/edges silently missing this increment.
        if not recomputed and ckpt.is_partition_complete(out_dir, "final"):
            os.remove(ckpt.manifest_path(out_dir, "final"))
        out_rows = _stage_a_partition(
            files,
            part,
            out_dir,
            gazetteer=gazetteer,
            index_ref=index_ref,
            batch_size=batch_size,
            concurrency=concurrency,
            write_enriched=write_enriched,
        )
        recomputed = True
        summary["partitions"].append(part)
        summary["input_rows"] += out_rows["input_rows"]
        summary["triple_rows"] += out_rows["triples"]

    # (No orphan sweep here — ingest never changes the valid-partition
    # set, it only appends; stage B merges the new triples into the
    # persisted bucket state.)
    return _finish_ingest_state(out_dir, summary, salt, t0)


def _main() -> None:
    """Job entrypoint (north rule: ``ray job submit`` execution):

        ray job submit --working-dir . -- \\
            python -m rust_bert_ray.pipelines.kg INPUT_DIR OUT_DIR \\
                [--n-groups N] [--batch-size B] [--no-resume] [--ingest]

    ``--ingest`` treats INPUT_DIR as a NEW corpus shard appended to an
    existing OUT_DIR (extraction over the shard only; global
    canonicalize over all checkpointed triples — ingest_kg_increment).

    On a cluster the driver connects to the running Ray instance
    (RAY_ADDRESS from the job environment); standalone it starts a local
    session.  Only this CLI owns the session — library code never calls
    ray.init().
    """
    import argparse
    import json

    p = argparse.ArgumentParser(description="KG-construction pipeline")
    p.add_argument("input_dir")
    p.add_argument("out_dir")
    p.add_argument("--n-groups", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--no-enriched", action="store_true")
    p.add_argument("--ingest", action="store_true")
    args = p.parse_args()

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    if args.ingest:
        summary = ingest_kg_increment(
            args.input_dir,
            args.out_dir,
            n_groups=args.n_groups,
            batch_size=args.batch_size,
            write_enriched=not args.no_enriched,
        )
    else:
        summary = run_kg_pipeline(
            args.input_dir,
            args.out_dir,
            n_groups=args.n_groups,
            batch_size=args.batch_size,
            resume=not args.no_resume,
            write_enriched=not args.no_enriched,
        )
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    _main()
