"""SST-2 TSV reader → sentiment input rows.

Mirrors ``ss2_processor``
(/root/reference/examples/sentiment_analysis_sst2.rs:27-39): a
tab-delimited file with a header row and a ``sentence`` column; the
processor extracts the sentence strings (the label column, when present,
is carried through for evaluation use).

Ray-Data-first: ``ray.data.read_csv`` with a tab ParseOptions — the read
is distributed and streaming (no driver-side materialization), unlike
the reference's single-process csv loop.
"""

from __future__ import annotations


def read_sst2(path: str, include_labels: bool = True):
    """SST-2 train/dev TSV → Dataset with (idx, sentence[, label])."""
    from pyarrow import csv as pacsv

    import ray.data

    # quote_char=False: SST-2 is raw unquoted TSV (the reference's csv
    # reader does no quote handling either) — real sentences contain
    # unbalanced double quotes that would otherwise swallow tabs/rows
    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t", quote_char=False),
    )
    names = ds.schema().names
    if "sentence" not in names:
        raise ValueError(f"not an SST-2 file (no 'sentence' column): {names}")
    keep = ["sentence"] + (["label"] if include_labels and "label" in names else [])
    return ds.select_columns(keep)
