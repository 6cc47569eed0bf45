"""Artifact cache + URL helpers (the reference common/utils.py subset that
matters: is_url, cache-path resolution, cached download with the
rank0-downloads-then-barrier pattern).

In zero-egress deployments ``download_cached_file`` only resolves existing
cache entries and raises with a clear message otherwise.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import urllib.parse
import urllib.request
from typing import Optional

from sprc_tpu.registry import registry


def is_url(path: str) -> bool:
    return urllib.parse.urlparse(path).scheme in ("http", "https")


def cache_root() -> str:
    root = registry.get_path("cache_root") or os.environ.get(
        "SPRC_CACHE", os.path.expanduser("~/.cache/sprc_tpu")
    )
    os.makedirs(root, exist_ok=True)
    return root


def get_cache_path(rel_path: str) -> str:
    return os.path.join(cache_root(), rel_path)


def cached_path(url_or_path: str) -> str:
    """URL -> local cache path (deterministic name); local paths pass through."""
    if not is_url(url_or_path):
        return url_or_path
    name = os.path.basename(urllib.parse.urlparse(url_or_path).path)
    digest = hashlib.sha256(url_or_path.encode()).hexdigest()[:16]
    return get_cache_path(f"{digest}_{name}")


def download_cached_file(url: str, *, progress: bool = False,
                         allow_network: Optional[bool] = None) -> str:
    """Resolve (and on connected hosts, fetch) a cached artifact.

    Host 0 downloads, others wait (the reference's barrier pattern,
    dist_utils.py:117-137).
    """
    from sprc_tpu.parallel.dist import barrier, is_main_process

    target = cached_path(url)
    if os.path.exists(target):
        return target
    if allow_network is None:
        allow_network = os.environ.get("SPRC_ALLOW_DOWNLOAD", "0") == "1"
    if not allow_network:
        raise FileNotFoundError(
            f"artifact for {url} not in cache ({target}); this environment is "
            "offline — place the file there manually or set SPRC_ALLOW_DOWNLOAD=1"
        )
    if is_main_process():
        tmp = target + ".tmp"
        with urllib.request.urlopen(url) as resp, open(tmp, "wb") as f:
            shutil.copyfileobj(resp, f)
        os.replace(tmp, target)
    barrier()
    return target
