"""Entity linking against a broadcast alias/embedding index.

Net-new operator (north rule; nearest reference analog is the
sentence-embeddings cosine path,
/root/reference/src/pipelines/sentence_embeddings/pipeline.rs:372-417 +
keywords_extraction/scorer.rs:63-88): each mention is resolved to a
canonical entity by

1. exact alias lookup (normalized surface), else
2. embedding cosine similarity vs the index's canonical-name embeddings,
   reranked with a string prior (char-3-gram Jaccard):
   ``final = 0.7·cos + 0.3·jaccard``; below ``threshold`` the mention
   stays unlinked (it will found its own node).

Distribution: the index is small-side state — built once on the driver,
shipped via ``ray.put`` ONCE, and materialized per actor in ``__init__``
(NOT per batch).  This is broadcast-semi-join semantics; no shuffle.
A per-actor result cache collapses repeated surfaces (Zipfian mentions).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from rust_bert_ray.scorers import HashEmbedder


def _norm(surface: str) -> str:
    return " ".join(surface.lower().split())


def _trigrams(s: str) -> set[str]:
    p = f"#{s}#"
    return {p[i : i + 3] for i in range(max(1, len(p) - 2))}


def node_id_for(kind: str, canonical: str) -> str:
    return f"ent:{kind}:{_norm(canonical).replace(' ', '_')}"


class AliasIndex:
    """Broadcastable alias/embedding index.

    ``entities``: canonical surface → kind (PER/ORG/LOC).
    ``aliases``: extra alias surface → canonical surface (exact path).
    """

    def __init__(
        self,
        entities: dict[str, str],
        aliases: dict[str, str] | None = None,
        dim: int = 64,
    ):
        self.embedder = HashEmbedder(dim=dim)
        self.canonical_kind = dict(entities)
        self.exact: dict[str, tuple[str, str]] = {}
        for canonical, kind in entities.items():
            self.exact[_norm(canonical)] = (canonical, kind)
        for alias, canonical in (aliases or {}).items():
            kind = entities[canonical]
            self.exact[_norm(alias)] = (canonical, kind)
        self.names = list(entities.keys())
        self.kinds = np.array([entities[n] for n in self.names])
        self.matrix = self.embedder.embed_batch(self.names)  # L2-normalized
        self.name_trigrams = [_trigrams(_norm(n)) for n in self.names]

    def link(self, surface: str, threshold: float = 0.6) -> tuple[str | None, str, float, str]:
        """→ (canonical or None, kind, score, method)."""
        key = _norm(surface)
        hit = self.exact.get(key)
        if hit is not None:
            canonical, kind = hit
            return canonical, kind, 1.0, "exact"
        if not self.names:
            return None, "", 0.0, "none"
        q = self.embedder.embed(surface)
        cos = self.matrix @ q  # both sides L2-normalized
        tg = _trigrams(key)
        top = np.argsort(-cos)[:8]  # string-prior rerank over the cosine top-8
        best_i, best_score = -1, -1.0
        for i in top:
            inter = len(tg & self.name_trigrams[i])
            union = len(tg | self.name_trigrams[i])
            jac = inter / union if union else 0.0
            score = 0.7 * float(cos[i]) + 0.3 * jac
            if score > best_score:
                best_i, best_score = int(i), score
        if best_score >= threshold:
            return self.names[best_i], str(self.kinds[best_i]), best_score, "ann"
        return None, "", best_score, "none"


LINK_COLS = [
    ("subj_key", pa.string()),
    ("subj_id", pa.string()),
    ("subj_canonical", pa.string()),
    ("subj_link_score", pa.float64()),
    ("obj_key", pa.string()),
    ("obj_id", pa.string()),
    ("obj_canonical", pa.string()),
    ("obj_link_score", pa.float64()),
]


class LinkingStage:
    """triples → triples + (surface_key, node_id, link_score) per side.

    ``index_ref`` is either an AliasIndex or a ``ray.ObjectRef`` to one
    (broadcast); resolved once in ``__init__``.
    """

    def __init__(self, index_ref, threshold: float = 0.6):
        # Index resolution is LAZY so the stage works both as an actor
        # pool (resolve once per actor) and as a task-pool instance: the
        # instance ships with only the ObjectRef and each task's first
        # batch does a zero-copy ray.get from the LOCAL object store —
        # an eager get here would pickle the whole index into the task
        # closure instead.
        self._index_ref = index_ref
        self._index: AliasIndex | None = None
        self.threshold = threshold
        self.cache: dict[tuple[str, str], tuple[str, str, float]] = {}

    @property
    def index(self) -> AliasIndex:
        if self._index is None:
            import ray

            self._index = (
                ray.get(self._index_ref)
                if isinstance(self._index_ref, ray.ObjectRef)
                else self._index_ref
            )
        return self._index

    def _resolve(self, surface: str, label: str) -> tuple[str, str, str, float]:
        """→ (surface_key, node_id, canonical, link_score)."""
        key = (surface, label)
        cached = self.cache.get(key)
        if cached is not None:
            return cached
        canonical, kind, score, _method = self.index.link(surface, self.threshold)
        surface_key = _norm(surface)
        if canonical is not None:
            out = (surface_key, node_id_for(kind, canonical), canonical, score)
        else:
            out = (
                surface_key,
                f"surface:{label}:{surface_key.replace(' ', '_')}",
                surface,
                0.0,
            )
        if len(self.cache) < 1_000_000:
            self.cache[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        subj_label = batch.column("subj_label").to_pylist()
        obj = batch.column("obj").to_pylist()
        obj_label = batch.column("obj_label").to_pylist()
        cols: dict[str, list] = {name: [] for name, _ in LINK_COLS}
        for s, sl, o, ol in zip(subj, subj_label, obj, obj_label):
            sk, sid, sc, ss = self._resolve(s, sl)
            ok_, oid, oc, os_ = self._resolve(o, ol)
            cols["subj_key"].append(sk)
            cols["subj_id"].append(sid)
            cols["subj_canonical"].append(sc)
            cols["subj_link_score"].append(ss)
            cols["obj_key"].append(ok_)
            cols["obj_id"].append(oid)
            cols["obj_canonical"].append(oc)
            cols["obj_link_score"].append(os_)
        for name, typ in LINK_COLS:
            batch = batch.append_column(name, pa.array(cols[name], type=typ))
        return batch
