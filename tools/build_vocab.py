"""Generate the bundled WordPiece vocab (rust_bert_ray/data/wordpiece_vocab.txt).

Deterministic: built from the corpus generator's closed surface pool
(rust_bert_ray.corpus constants), the documents-table word inventory
(closed 31-word set in the driver testdata), the deterministic-LM vocab,
and an ascii char + ##char fallback alphabet that guarantees greedy
longest-match never hits the [UNK] dead-end for ascii words.

Layout follows the standard BERT id convention so the repo's existing
CLS_ID/SEP_ID constants (101/102) are real vocab ids:

    0       [PAD]
    1-99    [unused0]..[unused98]
    100-103 [UNK] [CLS] [SEP] [MASK]
    104+    single chars, ##single chars, suffix pieces, whole words

Run: python tools/build_vocab.py   (idempotent; overwrites the file)
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rust_bert_ray", "data", "wordpiece_vocab.txt",
)

# closed word inventory of the driver's documents tables (TESTDATA.md)
DOCUMENT_WORDS = """a agg batch big column customer data dup fast filter group
hash join key line merge order part query row scan slow sort spark stream
table the value window wide dedup""".split()

COMMON_WORDS = """the a an and or of in on at to for is are was were be been
this that it with as by from not no yes all any each more most other some
such only own same so than too very just about into over under again
name live city asked works headquartered visited last spring quarterly
report finalized time rained afternoon committee adjourned without
decision my i summarize where does ref""".split()

SUFFIX_PIECES = """##s ##es ##ed ##ing ##er ##est ##ly ##ion ##tion ##al
##ous ##ive ##able ##ment ##ness ##ity ##ism ##ist ##ize ##ise""".split()


def corpus_words() -> list[str]:
    from rust_bert_ray.corpus import LOCS, ORGS, PERSONS, TEMPLATES, VARIANTS

    words: set[str] = set()
    for pool in (PERSONS, ORGS, LOCS, list(VARIANTS) + list(VARIANTS.values())):
        for surface in pool:
            words.update(surface.split())
    for template, _, _ in TEMPLATES:
        for w in template.replace("{0}", " ").replace("{1}", " ").split():
            words.add(w.strip(".,!?"))
    return sorted(words)


def lm_words() -> list[str]:
    from rust_bert_ray.stages.generation import DeterministicLM, EOS

    return [w for w in DeterministicLM().vocab if w != EOS]


def main() -> None:
    pieces: list[str] = ["[PAD]"]
    pieces += [f"[unused{i}]" for i in range(99)]
    pieces += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    chars = list(string.ascii_lowercase + string.ascii_uppercase + string.digits) + [
        c for c in string.punctuation
    ]
    pieces += chars
    pieces += [f"##{c}" for c in chars]
    seen = set(pieces)

    def add(piece: str) -> None:
        if piece and piece not in seen:
            seen.add(piece)
            pieces.append(piece)

    for p in SUFFIX_PIECES:
        add(p)
    for w in sorted(set(corpus_words()) | set(DOCUMENT_WORDS) | set(COMMON_WORDS)
                    | set(lm_words())):
        add(w)
        add(w.lower())
        # continuation form so mid-word matches are possible
        add(f"##{w.lower()}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(pieces) + "\n")
    print(f"wrote {len(pieces)} pieces -> {OUT}")


if __name__ == "__main__":
    main()
