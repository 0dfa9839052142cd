"""Sentence-embedding pooling modes.

Reproduces ``Pooling::forward`` at
/root/reference/src/pipelines/sentence_embeddings/layers.rs:39-74 and the
L2 normalization at .../pipeline.rs:403-411 (norm clamped at 1e-12).

Shapes: ``token_embeddings`` is [seq, dim] (one sequence) or [batch, seq,
dim]; ``attention_mask`` is [seq] / [batch, seq] of {0,1}.
"""

from __future__ import annotations

import numpy as np


def pool(
    token_embeddings: np.ndarray,
    attention_mask: np.ndarray,
    mode: str = "mean",
) -> np.ndarray:
    """mode ∈ {cls, max, mean, mean_sqrt_len}."""
    emb = np.asarray(token_embeddings, dtype=np.float64)
    mask = np.asarray(attention_mask, dtype=np.float64)
    squeeze = emb.ndim == 2
    if squeeze:
        emb = emb[None, ...]
        mask = mask[None, ...]
    if mode == "cls":
        out = emb[:, 0, :]
    elif mode == "max":
        masked = np.where(mask[..., None] == 0, -1e9, emb)
        out = masked.max(axis=1)
    elif mode in ("mean", "mean_sqrt_len"):
        expanded = mask[..., None]
        s = (emb * expanded).sum(axis=1)
        denom = np.clip(expanded.sum(axis=1), 10e-9, None)  # layers.rs:63 clamp_min(10e-9)
        out = s / denom if mode == "mean" else s / np.sqrt(denom)
    else:
        raise ValueError(f"unknown pooling mode {mode!r}")
    return out[0] if squeeze else out


def l2_normalize(embeddings: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalize; norm clamped at 1e-12 (pipeline.rs:403-411)."""
    emb = np.asarray(embeddings, dtype=np.float64)
    norms = np.linalg.norm(emb, axis=-1, keepdims=True)
    return emb / np.clip(norms, 1e-12, None)
