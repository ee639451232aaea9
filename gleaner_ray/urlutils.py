"""URL canonicalization helpers for frontier partitioning.

The frontier is hash-partitioned by canonicalized host (SURVEY §7.3);
mega-hosts are salted into sub-buckets for order-insensitive stages.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlparse

__all__ = ["canonical_host", "canonical_url", "host_bucket", "sha_shard"]


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


_TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=")


def canonical_url(url: str) -> str:
    """Full URL canonicalization for frontier dedup — the deep version
    of the reference's loc-trim cleanup (sitemaps.go loc handling):
    two syntactically-different spellings of one resource map to one
    frontier key, so the seen-set and the politeness queue never crawl
    an alias twice.

    Rules (each expressible in ANSI SQL so the oracle mirrors them):
    scheme+host lowercased, default port (:80 http / :443 https)
    dropped, path '//'+ collapsed and one trailing '/' stripped (root
    kept), tracking params (utm_*, fbclid, gclid, msclkid) dropped,
    remaining query params sorted bytewise, fragment dropped."""
    i = url.find("://")
    if i == -1:
        return url
    scheme = url[:i].lower()
    rest = url[i + 3 :]
    end = _authority_end(rest)
    auth, tail = rest[:end].lower(), rest[end:]
    if scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    elif scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    frag = tail.find("#")
    if frag != -1:
        tail = tail[:frag]
    q = tail.find("?")
    path, query = (tail[:q], tail[q + 1 :]) if q != -1 else (tail, "")
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    if query:
        parts = sorted(
            p
            for p in query.split("&")
            if p and not p.lower().startswith(_TRACKING_PREFIXES)
        )
        query = "&".join(parts)
    out = scheme + "://" + auth + path
    if query:
        out += "?" + query
    return out
