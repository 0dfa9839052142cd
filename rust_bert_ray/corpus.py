"""Deterministic synthetic interleaved-document corpus (input_hint schema).

Generates Lance-shaped tables of interleaved text+media documents:

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

plus the *expected triples* table derived from the sentence templates, so
triple P/R vs the extraction pipeline is known by construction
(FIXTURES.md §1, §3.3).  Text spans are filled from a closed template pool
that embeds the reference-test sentences verbatim
(/root/reference/tests/bert.rs:388-450 inputs), with combinatorial
person/org/location slot fillers.

Everything is seeded (default seed=13); no wall-clock, no external data.
Lance is unavailable in this sandbox, so tables are written as sharded
parquet — the schema is identical and `ray.data.read_parquet` /
`read_lance` are drop-in for each other at the pipeline level.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------- gazetteers

FIRST = ["Amy", "John", "Maria", "Pierre", "Anna", "Louis", "Sofia", "David",
         "Elena", "Marco", "Julia", "Omar", "Nina", "Pavel", "Greta", "Hugo"]
LAST = ["Smith", "Johnson", "Dupont", "Garcia", "Novak", "Keller", "Rossi",
        "Tanaka", "Larsen", "Silva", "Weber", "Moreau"]

PERSONS = ["Amy", "John Smith"] + [
    f"{f} {l}" for f in FIRST for l in LAST if f"{f} {l}" != "John Smith"
][: 62]

ORGS = ["Acme Corp", "Globex Inc", "Initech", "Umbrella Group", "Stark Industries",
        "Wayne Enterprises", "Tyrell Corp", "Cyberdyne Systems", "Wonka Industries",
        "Gringotts Bank", "Aperture Science", "Black Mesa", "Hooli", "Pied Piper",
        "Massive Dynamic", "Oscorp", "Soylent Corp", "Vandelay Industries",
        "Duff Brewing", "Sterling Cooper"]

LOCS = ["Paris", "France", "New York", "Amsterdam", "Berlin", "Tokyo", "London",
        "Madrid", "Rome", "Vienna", "Lisbon", "Prague", "Dublin", "Oslo",
        "Helsinki", "Warsaw", "Athens", "Cairo", "Sydney", "Toronto"]

# Variant surfaces: tagged by NER (they are in the gazetteer) but resolved to
# a different canonical node by the *embedding* linking path (they are
# deliberately absent from the exact-alias map).
VARIANTS = {"New York City": "New York", "Acme Corporation": "Acme Corp"}

GAZETTEER: dict[str, str] = {}
for _p in PERSONS:
    GAZETTEER[_p] = "PER"
for _o in ORGS:
    GAZETTEER[_o] = "ORG"
for _l in LOCS:
    GAZETTEER[_l] = "LOC"
GAZETTEER["New York City"] = "LOC"
GAZETTEER["Acme Corporation"] = "ORG"

# ------------------------------------------------------------------ templates

# (template, slots, (subj_slot, predicate, obj_slot) or None)
TEMPLATES: list[tuple[str, tuple[str, ...], tuple[int, str, int] | None]] = [
    ("My name is {0}. I live in {1}.", ("PER", "LOC"), (0, "lives_in", 1)),
    ("Asked {0} about {1}", ("PER", "ORG"), (0, "affiliated_with", 1)),
    ("{0} is a city in {1}.", ("CITY", "COUNTRY"), (0, "located_in", 1)),
    ("{0} works for {1}.", ("PER", "ORG"), (0, "works_for", 1)),
    ("{0} is headquartered in {1}.", ("ORG", "LOC"), (0, "headquartered_in", 1)),
    ("{0} visited {1} last spring.", ("PER", "LOC"), (0, "visited", 1)),
    ("The quarterly report was finalized on time.", (), None),
    ("It rained for most of the afternoon.", (), None),
    ("The committee adjourned without a decision.", (), None),
]

# located_in pairs are fixed city→country facts so the oracle is stable.
CITY_COUNTRY = [("Paris", "France"), ("New York City", "France"),
                ("Berlin", "France"), ("Rome", "France")]
# NOTE: object is always "France" to keep a single COUNTRY surface; the
# point of the pair list is varied *subjects* including a VARIANT surface.

MEDIA_KINDS = ["image", "audio", "table"]

PREDICATES = ["no_relation", "lives_in", "affiliated_with", "located_in",
              "works_for", "headquartered_in", "visited"]


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def canonical_surface(surface: str) -> str:
    return VARIANTS.get(surface, surface)


def _make_docs(
    rng: np.random.Generator,
    start_idx: int,
    n: int,
    diversify: bool = False,
    skew: float = 0.0,
):
    """Vectorized-draw doc generator: all randomness is pulled as flat
    numpy arrays up front (per-call rng.integers is ~µs each and dominates
    at 100k docs), then consumed with a cursor while building strings.

    ``skew`` > 0 redirects that fraction of every entity draw to the
    FIRST gazetteer entry (Amy / Acme Corp / Paris), producing a
    hot-entity corpus for skew stress tests — the north rule's "salting
    for hot-entity skew" claim measured, not just salt-invariance-tested.
    The bias mask is drawn AFTER every existing array so ``skew=0``
    corpora are byte-identical to pre-knob output (same rng consumption
    order), keeping every recorded oracle stable."""
    n_spans_arr = rng.integers(3, 10, size=n)
    total = int(n_spans_arr.sum())
    is_text = rng.random(total) < 0.6
    t_idx = rng.integers(0, len(TEMPLATES), size=total)
    f_per = rng.integers(0, len(PERSONS), size=total)
    f_org = rng.integers(0, len(ORGS), size=total)
    f_loc = rng.integers(0, len(LOCS), size=total)
    f_city = rng.integers(0, len(CITY_COUNTRY), size=total)
    f_media = rng.integers(0, len(MEDIA_KINDS), size=total)
    if skew > 0.0:
        hot = rng.random(total) < skew
        for arr in (f_per, f_org, f_loc, f_city):
            arr[hot] = 0

    doc_ids, all_spans, triple_rows = [], [], []
    cur = 0
    for i in range(n):
        doc_idx = start_idx + i
        doc_id = f"doc-{doc_idx:08d}"
        spans = []
        for off in range(int(n_spans_arr[i])):
            if is_text[cur]:
                template, slots, rel = TEMPLATES[t_idx[cur]]
                fillers: list[str] = []
                for slot in slots:
                    if slot == "PER":
                        fillers.append(PERSONS[f_per[cur]])
                    elif slot == "ORG":
                        fillers.append(ORGS[f_org[cur]])
                    elif slot == "LOC":
                        fillers.append(LOCS[f_loc[cur]])
                    elif slot == "CITY":
                        fillers.append(CITY_COUNTRY[f_city[cur]][0])
                    elif slot == "COUNTRY":
                        fillers.append("France")
                text = template.format(*fillers)
                if diversify:
                    # unique trailing token per span: kills verbatim repeats
                    # (bench realism — real corpora don't repeat templates),
                    # tagged "O" so triples are unchanged
                    text = f"{text} ref {doc_idx:08d}x{off}"
                spans.append(
                    {"kind": "text", "text": text, "media_ref": "", "offset": off}
                )
                if rel is not None:
                    s_slot, pred, o_slot = rel
                    triple_rows.append(
                        {
                            "doc_id": doc_id,
                            "subj": canonical_surface(fillers[s_slot]),
                            "pred": pred,
                            "obj": canonical_surface(fillers[o_slot]),
                        }
                    )
            else:
                kind = MEDIA_KINDS[f_media[cur]]
                ref = f"media://{_crc(f'{doc_id}/{off}'):08x}"
                spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": off})
            cur += 1
        doc_ids.append(doc_id)
        all_spans.append(spans)
    return doc_ids, all_spans, triple_rows


# Reference-test sentences embedded verbatim as the first documents
# (tests/bert.rs:388-450 inputs) so reference-derived expectations hold.
FIXTURE_DOCS: list[tuple[list[str], list[tuple[str, str, str]]]] = [
    (["My name is Amy. I live in Paris."], [("Amy", "lives_in", "Paris")]),
    (["Paris is a city in France."], [("Paris", "located_in", "France")]),
    (["Asked John Smith about Acme Corp"],
     [("John Smith", "affiliated_with", "Acme Corp")]),
    (["Let's go to New York!"], []),
]


SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPAN_TYPE)])
TRIPLES_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("subj", pa.string()), ("pred", pa.string()),
     ("obj", pa.string())]
)


def generate(
    n_docs: int, seed: int = 13, diversify: bool = False, skew: float = 0.0
):
    """Return (docs: pa.Table, expected_triples: pa.Table)."""
    rng = np.random.default_rng(seed)
    doc_ids, all_spans, triple_rows = [], [], []
    for i, (texts, triples) in enumerate(FIXTURE_DOCS):
        if i >= n_docs:
            break
        doc_id = f"doc-{i:08d}"
        doc_ids.append(doc_id)
        all_spans.append(
            [
                {"kind": "text", "text": t, "media_ref": "", "offset": j}
                for j, t in enumerate(texts)
            ]
        )
        triple_rows.extend(
            {"doc_id": doc_id, "subj": s, "pred": p, "obj": o} for s, p, o in triples
        )
    if n_docs > len(FIXTURE_DOCS):
        ids2, spans2, triples2 = _make_docs(
            rng, len(FIXTURE_DOCS), n_docs - len(FIXTURE_DOCS), diversify, skew
        )
        doc_ids.extend(ids2)
        all_spans.extend(spans2)
        triple_rows.extend(triples2)
    docs = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": all_spans}, schema=DOCS_SCHEMA
    )
    triples = (
        pa.Table.from_pylist(triple_rows, schema=TRIPLES_SCHEMA)
        if triple_rows
        else TRIPLES_SCHEMA.empty_table()
    )
    return docs, triples


def write_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 13,
    shard_rows: int = 20_000,
    diversify: bool = False,
    skew: float = 0.0,
) -> str:
    """Write sharded docs parquet + expected_triples parquet; idempotent.

    Sharding matters: one file per ``shard_rows`` docs gives Ray Data read
    parallelism and gives the checkpointed pipeline its resume granularity
    (one manifest per input file group).  Row groups are kept small so the
    reader can split files further when the cluster is wide.
    """
    docs_dir = os.path.join(out_dir, "docs")
    marker = os.path.join(
        out_dir,
        f".complete-{n_docs}-{seed}{'-d' if diversify else ''}"
        f"{f'-s{skew}' if skew else ''}",
    )
    if os.path.exists(marker):
        return docs_dir
    os.makedirs(docs_dir, exist_ok=True)
    docs, triples = generate(n_docs, seed, diversify, skew)
    for shard_no, start in enumerate(range(0, max(n_docs, 1), shard_rows)):
        pq.write_table(
            docs.slice(start, shard_rows),
            os.path.join(docs_dir, f"part-{shard_no:05d}.parquet"),
            row_group_size=max(1024, shard_rows // 8),
        )
    pq.write_table(triples, os.path.join(out_dir, "expected_triples.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return docs_dir
