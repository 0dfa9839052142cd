"""Resource providers: uniform access to model/config artifacts.

Mirrors the ``ResourceProvider`` trait family
(/root/reference/src/common/resources/mod.rs:43-74, local.rs, buffer.rs,
remote.rs:10-121): a provider yields a local filesystem path (and/or raw
bytes) for a named artifact.

- ``LocalResource`` — wraps an existing path;
- ``BufferResource`` — in-memory bytes, materialized to a cache file on
  first ``get_local_path()``;
- ``CachedResource`` — the RemoteResource analog: a fetch callable +
  cache-subdir; the artifact is produced once into the cache directory
  and reused (the sandbox has no network, so the "remote" part is any
  callable that writes the file — download, copy, generate).  Cache root
  resolves like the reference: ``$RUSTBERT_RAY_CACHE`` override, else
  ``~/.cache/rust_bert_ray``.

Ray usage: providers are constructed cheaply on the driver and shipped
to actors; ``get_local_path()`` runs in actor ``__init__`` so each node
materializes the artifact once (per-node cache), exactly the reference's
load-once boundary (remote.rs:115-121 global cache).
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Protocol


class ResourceProvider(Protocol):
    def get_local_path(self) -> str: ...

    def get_bytes(self) -> bytes: ...


def cache_root() -> str:
    return os.environ.get(
        "RUSTBERT_RAY_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rust_bert_ray"),
    )


class LocalResource:
    def __init__(self, path: str):
        self.path = path

    def get_local_path(self) -> str:
        if not os.path.exists(self.path):
            raise FileNotFoundError(self.path)
        return self.path

    def get_bytes(self) -> bytes:
        with open(self.get_local_path(), "rb") as f:
            return f.read()


class BufferResource:
    def __init__(self, data: bytes, name: str = "buffer.bin"):
        self.data = data
        self.name = name
        self._lock = threading.Lock()

    def get_bytes(self) -> bytes:
        return self.data

    def get_local_path(self) -> str:
        target = os.path.join(cache_root(), "buffers", self.name)
        with self._lock:
            if not os.path.exists(target):
                os.makedirs(os.path.dirname(target), exist_ok=True)
                tmp = target + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(self.data)
                os.replace(tmp, target)
        return target


class CachedResource:
    """fetch-once-into-cache provider (RemoteResource analog)."""

    def __init__(self, name: str, cache_subdir: str, fetch: Callable[[str], None]):
        self.name = name
        self.cache_subdir = cache_subdir
        self.fetch = fetch
        self._lock = threading.Lock()

    def get_local_path(self) -> str:
        target = os.path.join(cache_root(), self.cache_subdir, self.name)
        with self._lock:
            if not os.path.exists(target):
                os.makedirs(os.path.dirname(target), exist_ok=True)
                tmp = target + ".tmp"
                self.fetch(tmp)
                os.replace(tmp, target)
        return target

    def get_bytes(self) -> bytes:
        with open(self.get_local_path(), "rb") as f:
            return f.read()
