"""Multimodal span handling: media columns as opaque refs with typed
metadata; decode/feature-extract as actor-pool stages.

The interleaved-doc schema carries media spans as ``(kind, media_ref)``
with empty text.  Real decoders (PIL / torchaudio / ffmpeg) are not in
this container, so ``decode_media`` is a clearly-marked STUB: by default
it produces a deterministic fake (metadata + features derived from the
ref hash) so the Ray-side plumbing — schema, batch sizes, actor pool,
output layout — is real and tested; with ``strict=True`` it raises
``NotImplementedError`` the way a missing codec would.

Scale notes: media payloads are LARGE binary — this stage keeps
``batch_size`` small (default 64) so batch × concurrency fits a worker
heap, and emits fixed-size feature vectors rather than decoded payloads.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_DIM = 8

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_offset", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("duration_ms", pa.int32()),
        ("feature", pa.list_(pa.float32(), MEDIA_FEATURE_DIM)),
    ]
)


def decode_media(kind: str, media_ref: str, strict: bool = False) -> dict:
    """STUB media decoder.

    strict=True → ``NotImplementedError`` (no image/audio libs in this
    container).  Otherwise returns deterministic fake metadata/features
    keyed on the ref hash so tests and benchmarks are reproducible.
    """
    if strict:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/ffmpeg, "
            "not available in this environment"
        )
    h = zlib.crc32(media_ref.encode())
    rng = np.random.default_rng(h)
    is_visual = kind in ("image", "video", "table")
    return {
        "width": int(64 + h % 1920) if is_visual else 0,
        "height": int(64 + (h >> 8) % 1080) if is_visual else 0,
        "n_bytes": int(1024 + h % (1 << 20)),
        "duration_ms": int(h % 600_000) if kind in ("audio", "video") else 0,
        "feature": rng.standard_normal(MEDIA_FEATURE_DIM).astype(np.float32),
    }


class MediaDecodeStage:
    """interleaved docs → one row per media span with metadata + features.

    ``map_batches(MediaDecodeStage(), batch_size=64)`` — small batches
    because real payloads are large; pass the CLASS with ``concurrency=N``
    instead when a real decoder makes ``__init__`` heavy (codec load).
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        rows: dict[str, list] = {name: [] for name in MEDIA_SCHEMA.names}
        for doc_id, spans in zip(doc_ids, spans_col):
            for span in spans or []:
                if span["kind"] == "text":
                    continue
                meta = decode_media(span["kind"], span["media_ref"], self.strict)
                rows["doc_id"].append(doc_id)
                rows["span_offset"].append(span["offset"])
                rows["kind"].append(span["kind"])
                rows["media_ref"].append(span["media_ref"])
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["n_bytes"].append(meta["n_bytes"])
                rows["duration_ms"].append(meta["duration_ms"])
                rows["feature"].append(meta["feature"])
        return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_offset", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int32()),
        ("feature_digest", pa.int64()),
    ]
)


class MediaFrameSampleStage:
    """timed media spans (audio/video) → evenly-spaced frame samples.

    The frame-sample operator of a multimodal training pipeline: each
    timed span yields ``n_frames`` rows at evenly spaced timestamps with
    a per-frame feature vector.  Decode is the same declared STUB as
    ``decode_media`` (deterministic fake keyed on ref hash + frame index;
    ``strict=True`` raises like a missing codec) — the Ray plumbing
    (schema, small batches for large payloads, per-frame explode) is
    real.  Features ship as crc32 digests, not vectors, so the output is
    value-hashable and small.
    """

    def __init__(self, n_frames: int = 3, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {name: [] for name in FRAME_SCHEMA.names}
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for span in spans or []:
                if span["kind"] not in ("audio", "video"):
                    continue
                meta = decode_media(span["kind"], span["media_ref"], self.strict)
                duration = meta["duration_ms"]
                h = zlib.crc32(span["media_ref"].encode())
                for k in range(self.n_frames):
                    ts = (duration * (k + 1)) // (self.n_frames + 1)
                    frame_rng = np.random.default_rng((h + 1) * 1_000_003 + k)
                    feat = frame_rng.standard_normal(MEDIA_FEATURE_DIM).astype(
                        np.float32
                    )
                    rows["doc_id"].append(doc_id)
                    rows["span_offset"].append(span["offset"])
                    rows["kind"].append(span["kind"])
                    rows["media_ref"].append(span["media_ref"])
                    rows["frame_idx"].append(k)
                    rows["ts_ms"].append(int(ts))
                    rows["feature_digest"].append(zlib.crc32(feat.tobytes()))
        return pa.Table.from_pydict(rows, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_offset", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("src_w", pa.int32()),
        ("src_h", pa.int32()),
        ("dst_w", pa.int32()),
        ("dst_h", pa.int32()),
        ("scale_pct", pa.int64()),  # round(dst/src * 10^4), hash-stable
    ]
)


class MediaResizeStage:
    """visual media spans → aspect-preserving resize plan (fit-in-box).

    The resize operator of a multimodal pipeline: each visual span's
    source dims (from the declared-stub decode) are fitted into
    ``max_side`` × ``max_side`` preserving aspect ratio (never
    upscaled).  The pixel work is the same declared STUB as
    ``decode_media`` (``strict=True`` raises like a missing codec); the
    dimension math, schema and explode plumbing are real.
    """

    def __init__(self, max_side: int = 512, strict: bool = False):
        self.max_side = max_side
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {name: [] for name in RESIZE_SCHEMA.names}
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for span in spans or []:
                if span["kind"] not in ("image", "video", "table"):
                    continue
                meta = decode_media(span["kind"], span["media_ref"], self.strict)
                w, h = meta["width"], meta["height"]
                scale = min(1.0, self.max_side / max(w, h, 1))
                dst_w = max(1, int(w * scale))
                dst_h = max(1, int(h * scale))
                rows["doc_id"].append(doc_id)
                rows["span_offset"].append(span["offset"])
                rows["kind"].append(span["kind"])
                rows["media_ref"].append(span["media_ref"])
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["dst_w"].append(dst_w)
                rows["dst_h"].append(dst_h)
                rows["scale_pct"].append(int(round(scale * 10_000)))
        return pa.Table.from_pydict(rows, schema=RESIZE_SCHEMA)


def media_inventory(docs_ds, concurrency: int = 2):
    """Per-kind span counts over an interleaved corpus (media + text)."""

    def count_kinds(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for spans in batch.column("spans").to_pylist():
            for span in spans or []:
                c[span["kind"]] += 1
        return pa.Table.from_pydict(
            {
                "kind": pa.array(list(c.keys()), type=pa.string()),
                "p_n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = docs_ds.map_batches(count_kinds, batch_format="pyarrow", batch_size=8192)
    agg = partials.groupby("kind", num_partitions=4).aggregate(Sum("p_n", alias_name="n_spans"))
    return agg


def media_transitions(docs_ds):
    """Interleaving profile: (kind → next kind) transition counts.

    Within each document, spans are ordered by their ``offset`` field
    and every adjacent pair contributes one (kind_a, kind_b) count —
    the layout statistic a mixed-modality chunker/packer keys on.
    Vectorized: the spans ListArray is flattened once per batch; pair
    keys are integer-encoded and counted with ``np.unique``.  Only the
    per-batch combined (kind_a, kind_b, n) partials are shuffled.
    """
    import numpy as np

    def count_transitions(batch: pa.Table) -> pa.Table:
        col = batch.column("spans")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten()
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_spans = np.diff(offsets)
        kinds = np.asarray(flat.field("kind").to_pylist(), dtype=object)
        span_off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n_spans)), n_spans)
        # order within doc by the span's own offset (robust to list order)
        order = np.lexsort((span_off, doc_idx))
        kinds, doc_idx = kinds[order], doc_idx[order]

        uniq, inv = np.unique(kinds, return_inverse=True)
        V = max(len(uniq), 1)
        same = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) > 1 else np.zeros(0, bool)
        code = inv[:-1][same] * V + inv[1:][same]
        ucode, counts = np.unique(code, return_counts=True)
        return pa.Table.from_pydict(
            {
                "kind_a": pa.array([uniq[c // V] for c in ucode], pa.string()),
                "kind_b": pa.array([uniq[c % V] for c in ucode], pa.string()),
                "p_n": pa.array(counts, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = docs_ds.map_batches(
        count_transitions, batch_format="pyarrow", batch_size=8192
    )
    return (
        partials.groupby(["kind_a", "kind_b"], num_partitions=4)
        .aggregate(Sum("p_n", alias_name="n"))
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "kind_a": t.column("kind_a"),
                    "kind_b": t.column("kind_b"),
                    "n": t.column("n"),
                }
            ),
            batch_format="pyarrow",
        )
    )
