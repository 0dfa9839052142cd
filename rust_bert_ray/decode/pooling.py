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


class Dense:
    """Feed-forward projection over pooled sentence embeddings.

    Reproduces ``Dense::forward`` at
    /root/reference/src/pipelines/sentence_embeddings/layers.rs:113-153:
    a Linear(in_features → out_features, optional bias) followed by an
    activation — the sentence-transformers "dense module" applied between
    pooling and normalization.
    """

    ACTIVATIONS = {
        "tanh": np.tanh,
        "relu": lambda x: np.maximum(x, 0.0),
        "identity": lambda x: x,
    }

    def __init__(
        self,
        weight: np.ndarray,  # (out_features, in_features), like nn::Linear ws
        bias: np.ndarray | None = None,
        activation: str = "tanh",
    ):
        self.weight = np.asarray(weight, dtype=np.float64)
        self.bias = None if bias is None else np.asarray(bias, dtype=np.float64)
        if activation not in self.ACTIVATIONS:
            raise ValueError(f"Invalid Activation: {activation}")
        self.activation = self.ACTIVATIONS[activation]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        out = np.asarray(x, dtype=np.float64) @ self.weight.T
        if self.bias is not None:
            out = out + self.bias
        return self.activation(out)

    @classmethod
    def deterministic(
        cls, in_features: int, out_features: int, seed: int = 17,
        activation: str = "tanh",
    ) -> "Dense":
        """Seeded stand-in for loaded dense weights (``vs_dense.load``) —
        reproducible across processes/actors."""
        rng = np.random.default_rng(seed)
        w = rng.standard_normal((out_features, in_features)) / np.sqrt(in_features)
        b = rng.standard_normal(out_features) * 0.01
        return cls(w, b, activation)
