"""rust_bert_ray — a Ray-Data-native data-processing / KG-construction engine.

Re-expresses the query & data-processing capabilities of
guillaume-be/rust-bert (reference at /root/reference, v0.23.0) on top of
``ray.data.Dataset`` pipelines: zero-copy Arrow batches, actor pools for
stateful (model-holding) stages, explicit partitioning/shuffle/skew
handling, and per-partition checkpoints for resumable runs.

Layers
------
- ``tokenization`` / ``decode``  — pure-Python decode semantics that mirror
  the reference's pipeline layer (windowing, consolidation, BIO/BIOES
  chunking, QA span algebra, pooling, keyword rankers).  No Ray, fully
  unit-tested against fixtures derived from the reference's tests.
- ``scorers``    — pluggable model backends behind one protocol; the
  in-sandbox backend is deterministic (hash/gazetteer-driven logits).
- ``stages``     — Ray Data stages (map_batches callables / actor classes).
- ``pipelines``  — end-to-end KG construction + checkpointing.
- ``functions``  — relational / text / dedup / similarity operators used by
  the oracle-checked query surface in ``__ray_entry__.py``.

No library code calls ``ray.init()``; sessions are owned by the driver,
``bench.py``, the test fixture, or the ``python -m
rust_bert_ray.pipelines.kg`` job entrypoint (a guarded ``__main__`` CLI
for ``ray job submit``).
"""

__version__ = "0.1.0"
