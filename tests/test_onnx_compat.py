"""ONNX backend seam (rust_bert_ray/onnx_compat.py).

The sandbox image has no ``onnxruntime``, so the loader itself must
fail fast with an actionable error — and the Ray-side plumbing a real
session would ride (NerStage's batched-tensor path accepting a
FORWARD-ONLY scorer: no ``tag_words``, all-zero ``tag_ids``
side-channel, dynamic per-batch padding) must be real and exercised by
a fake with exactly an ONNX session's surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_bert_ray.corpus import GAZETTEER
from rust_bert_ray.onnx_compat import OnnxTagScorer, have_onnxruntime
from rust_bert_ray.scorers import NER_LABELS
from rust_bert_ray.stages.ner import NerStage

from test_tensor_backend import _spans_batch

B_LOC = NER_LABELS.index("B-LOC")


def test_loader_fails_fast_without_onnxruntime():
    if have_onnxruntime():  # pragma: no cover - not this image
        pytest.skip("onnxruntime present; gating path not reachable")
    with pytest.raises(ImportError, match="onnxruntime"):
        OnnxTagScorer("/tmp/does_not_matter.onnx")


class ForwardOnlyScorer:
    """Exactly an ONNX session's surface: ``forward`` from input_ids +
    attention_mask, no ``tag_words``, ``tag_ids`` ignored.  Tags every
    attended position B-LOC so real chunk/consolidate decode runs."""

    def __init__(self):
        self.calls = []

    def forward(self, input_ids, attention_mask, tag_ids):
        self.calls.append(
            (input_ids.shape, input_ids.dtype.str, tag_ids.copy())
        )
        logits = np.zeros(input_ids.shape + (len(NER_LABELS),))
        logits[..., B_LOC] = np.where(attention_mask, 5.0, 0.0)
        return logits


def test_forward_only_scorer_drives_tensor_path():
    sc = ForwardOnlyScorer()
    stage = NerStage(GAZETTEER, scorer=sc)
    assert stage._tensor and not stage._fast

    out = stage(
        _spans_batch(["Anna Schmidt works", "", "one two three four"])
    ).to_pandas()

    # one padded forward for all windows; int64 ids; the tag_ids
    # side-channel stays all-O for a backend with no tag_words
    assert len(sc.calls) == 1
    shape, dtype, tag_ids = sc.calls[0]
    assert shape[0] == 2 and dtype == "<i8"  # two non-empty texts
    assert np.all(tag_ids == 0)

    # every word became its own B-LOC entity via the real decode path
    ents = [e for row in out["entities"] for e in row]
    assert {e["label"] for e in ents} == {"LOC"}
    assert len(ents) == 7  # 3 + 0 + 4 words


def test_forward_only_empty_batch_no_features():
    """All-empty texts short-circuit to zero entities without the
    per-text fallback (which a forward-only backend cannot take)."""
    stage = NerStage(GAZETTEER, scorer=ForwardOnlyScorer())
    out = stage(_spans_batch(["", ""])).to_pandas()
    assert all(len(row) == 0 for row in out["entities"])
