"""ONNX-runtime compatibility layer (import-gated, like lance_compat).

The reference loads serialized models through a ``ModelResource`` that
may name an ONNX graph (rust-bert src/pipelines/onnx/*, selected via
``ModelResource::ONNX``); inference then runs through an onnxruntime
session instead of libtorch.  This sandbox image ships no
``onnxruntime`` package, so — exactly like the Lance writer in
sources/lance_compat.py — the loader here is the single swap point:
when ``onnxruntime`` is importable, :class:`OnnxTagScorer` builds a
real ``InferenceSession`` from a ``.onnx`` file (fetched through any
ResourceProvider, so the RemoteResource sha256/atomic-rename cache
applies) and serves ``forward(input_ids, attention_mask, tag_ids)``
calls from it; when it is not, construction fails fast with an
actionable error instead of silently degrading.

The Ray-side plumbing this backend rides — NerStage's batched-tensor
path with dynamic per-batch padding, actor-``__init__``-time
construction, ``num_gpus`` deploy hooks — is REAL and tested with a
forward-only fake (tests/test_onnx_compat.py): ``tag_ids`` is the
deterministic stand-in's side-channel and a serialized-model backend
ignores it by contract, which the stage honors by accepting scorers
that expose ``forward`` without ``tag_words``.
"""

from __future__ import annotations

import numpy as np

from rust_bert_ray.scorers import NER_LABELS


def have_onnxruntime() -> bool:
    try:
        import onnxruntime  # noqa: F401

        return True
    except ImportError:
        return False


class OnnxTagScorer:
    """Token-classification backend over an onnxruntime session.

    Drop-in for ``NerStage(scorer=...)`` next to TensorTagScorer: the
    stage detects ``forward`` and routes every window of a map_batches
    call through ONE padded ``session.run``.  Construct it in the actor
    ``__init__`` (via ``ner_stage_kwargs={"scorer": OnnxTagScorer(...)}``
    the session loads once per actor, not per batch); pair with
    ``ner_ray_remote_args={"num_gpus": 1}`` and a CUDA provider for GPU
    serving.

    Parameters
    ----------
    resource:
        a local ``.onnx`` path or any ResourceProvider
        (``get_local_path()`` — RemoteResource downloads/caches with
        sha256 + atomic rename, once per node).
    providers:
        onnxruntime execution providers, default CPU.
    input_names / output_name:
        graph tensor names; defaults match the HF ONNX export
        convention (``input_ids``, ``attention_mask`` → ``logits``).
    """

    def __init__(
        self,
        resource,
        providers: list[str] | None = None,
        input_names: tuple[str, str] = ("input_ids", "attention_mask"),
        output_name: str = "logits",
    ):
        if not have_onnxruntime():
            raise ImportError(
                "OnnxTagScorer requires the 'onnxruntime' package, which is "
                "not installed in this environment. Install onnxruntime (or "
                "onnxruntime-gpu) to load serialized ONNX token-"
                "classification models; the TensorTagScorer .npz backend "
                "covers the serialized-weights path without it."
            )
        import onnxruntime as ort

        path = (
            resource.get_local_path()
            if hasattr(resource, "get_local_path")
            else resource
        )
        self.session = ort.InferenceSession(
            path, providers=providers or ["CPUExecutionProvider"]
        )
        self.input_names = input_names
        self.output_name = output_name
        # fail fast on a label-head mismatch when the graph declares a
        # static class dimension — mis-indexed logit columns must never
        # decode silently (same contract as TensorTagScorer.from_npz)
        for out in self.session.get_outputs():
            if out.name == self.output_name and len(out.shape) == 3:
                n_cls = out.shape[2]
                if isinstance(n_cls, int) and n_cls != len(NER_LABELS):
                    raise ValueError(
                        f"ONNX graph output {self.output_name!r} has "
                        f"{n_cls} classes; this build decodes "
                        f"{len(NER_LABELS)} NER labels"
                    )

    def forward(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        tag_ids: np.ndarray | None = None,
    ) -> np.ndarray:
        """``int64[B,T] × bool[B,T] → float64[B,T,L]`` logits.

        ``tag_ids`` is accepted for signature compatibility with the
        deterministic stand-in and ignored — a trained model computes
        everything from ``input_ids``.
        """
        ids_name, mask_name = self.input_names
        (logits,) = self.session.run(
            [self.output_name],
            {
                ids_name: input_ids,
                mask_name: attention_mask.astype(np.int64),
            },
        )
        return np.asarray(logits, dtype=np.float64)
