"""Lance-format compatibility layer.

The north rule's storage format is Lance; this sandbox image has no
``lance``/``pylance`` package, so the pipeline materializes sharded
parquet with identical schemas.  These helpers are the single swap
point: when ``lance`` is importable they use the native Lance
reader/writer (``ray.data.read_lance`` / ``Dataset.write_lance``),
otherwise they fall back to parquet transparently.  Pipeline code calls
these instead of hardcoding a format.
"""

from __future__ import annotations


def have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(path: str, columns: list[str] | None = None):
    """ray.data Dataset from a Lance dataset dir (or parquet fallback)."""
    import ray.data

    if have_lance() and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_table(ds, path: str) -> None:
    """Write a Dataset as Lance when available, else parquet."""
    if have_lance() and path.endswith(".lance"):
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
