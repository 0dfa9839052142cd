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


class RemoteResource:
    """URL-backed provider (remote.rs:10-94 semantics): declares (url,
    cache_subdir) without downloading; ``get_local_path()`` downloads
    once into the cache with retries, optional checksum verification,
    and atomic rename — a partial/corrupted download never becomes the
    cached artifact, and a later call re-fetches it.

    The sandbox has no network, so tests exercise this through
    ``file://`` URLs and an injectable ``opener``; the HTTP path is the
    same code (urllib) with nothing swapped.
    """

    def __init__(
        self,
        url: str,
        cache_subdir: str = "default",
        sha256: str | None = None,
        max_retries: int = 2,
        timeout: float = 30.0,
        opener: Callable[[str, float], object] | None = None,
    ):
        self.url = url
        self.cache_subdir = cache_subdir
        self.sha256 = sha256
        self.max_retries = max_retries
        self.timeout = timeout
        self._opener = opener
        self._lock = threading.Lock()

    @classmethod
    def from_pretrained(cls, name_url_tuple: tuple[str, str]) -> "RemoteResource":
        """(name, url) → resource cached under ``<cache>/<name>/``
        (remote.rs:63-69)."""
        name, url = name_url_tuple
        return cls(url, cache_subdir=name)

    def _open(self, url: str):
        if self._opener is not None:
            return self._opener(url, self.timeout)
        import urllib.request

        return urllib.request.urlopen(url, timeout=self.timeout)

    def _digest(self, path: str) -> str:
        import hashlib

        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def _verify(self, path: str) -> bool:
        return self.sha256 is None or self._digest(path) == self.sha256

    def get_local_path(self) -> str:
        name = os.path.basename(self.url.rstrip("/")) or "resource.bin"
        target = os.path.join(cache_root(), self.cache_subdir, name)
        with self._lock:
            if os.path.exists(target) and self._verify(target):
                return target
            os.makedirs(os.path.dirname(target), exist_ok=True)
            tmp = target + f".download-{os.getpid()}"
            last_err: Exception | None = None
            for _attempt in range(self.max_retries + 1):
                try:
                    with self._open(self.url) as resp, open(tmp, "wb") as out:
                        while True:
                            chunk = resp.read(1 << 20)
                            if not chunk:
                                break
                            out.write(chunk)
                    if not self._verify(tmp):
                        raise IOError(
                            f"checksum mismatch for {self.url} "
                            f"(expected sha256 {self.sha256})"
                        )
                    os.replace(tmp, target)  # atomic: partials never land
                    return target
                except Exception as e:  # noqa: BLE001 — retry any fetch error
                    last_err = e
                    if os.path.exists(tmp):
                        os.remove(tmp)
            raise IOError(
                f"failed to fetch {self.url} after {self.max_retries + 1} "
                f"attempts: {last_err}"
            ) from last_err

    def get_bytes(self) -> bytes:
        with open(self.get_local_path(), "rb") as f:
            return f.read()
