"""Pure-Python decode-semantics library mirroring the reference pipelines.

Every module here is Ray-free and unit-tested against fixtures derived
from the reference's integration tests (see /root/repo/FIXTURES.md §3.8).
"""

from rust_bert_ray.decode.featurize import InputFeature, generate_features
from rust_bert_ray.decode.consolidate import Token, consolidate_tokens
from rust_bert_ray.decode.chunking import Entity, consolidate_entities

__all__ = [
    "InputFeature",
    "generate_features",
    "Token",
    "consolidate_tokens",
    "Entity",
    "consolidate_entities",
]
