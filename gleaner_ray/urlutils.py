"""URL canonicalization helpers for frontier partitioning.

The frontier is hash-partitioned by canonicalized host (SURVEY §7.3);
mega-hosts are salted into sub-buckets for order-insensitive stages.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlparse

__all__ = ["canonical_host", "host_bucket", "sha_shard"]


def _authority_end(rest: str) -> int:
    """Index of the first of '/', '?', '#' in rest (len(rest) if none):
    the authority ends at any of the three, not just '/'."""
    end = len(rest)
    for sep in ("/", "?", "#"):
        i = rest.find(sep)
        if i != -1 and i < end:
            end = i
    return end


def canonical_host(url: str) -> str:
    """Lowercased netloc with default ports stripped; '' on parse failure."""
    # fast path: scheme://host[:port][/?#]... via string ops (C speed)
    if url.startswith("https://"):
        rest = url[8:]
        host = rest[: _authority_end(rest)].lower()
        if host.endswith(":443"):
            host = host[:-4]
        if "@" not in host:
            return host
    elif url.startswith("http://"):
        rest = url[7:]
        host = rest[: _authority_end(rest)].lower()
        if host.endswith(":80"):
            host = host[:-3]
        if "@" not in host:
            return host
    try:
        parsed = urlparse(url)
    except ValueError:
        return ""
    host = (parsed.netloc or "").rsplit("@", 1)[-1].lower()
    if host.endswith(":80") and parsed.scheme == "http":
        host = host[:-3]
    elif host.endswith(":443") and parsed.scheme == "https":
        host = host[:-4]
    return host


def host_bucket(host: str, url: str, n_buckets: int) -> int:
    """Salted sub-bucket for mega-host skew mitigation: stages that don't
    need per-host ordering key on (host, bucket) instead of host."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") % max(1, n_buckets)


def sha_shard(sha: str, n_shards: int) -> int:
    """Stable shard id for the seen-set actor pool: hash(sha) % shards."""
    return int(sha[:8], 16) % max(1, n_shards)
