"""Recrawl change detection: diff two crawl snapshots of a frontier.

The reference crawls idempotently — a re-run StatObjects each sha and
skips what exists (jsonutils.go:384-388) — but it has no *scheduling*
signal for WHICH pages deserve recrawling. At 10^10 URLs that signal is
the core of crawl budgeting (cf. Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003): compare the content
hash of each URL across two snapshots, aggregate per host, and feed the
per-host change rate back into the frontier's priority column.

Scale shape — a BLOB-PACKED bucket exchange, not a row join. A naive
``Dataset.join`` / ``groupby(url)`` moves one row per URL through the
all-to-all, and the per-row cost of a million-row string-keyed exchange
dwarfs the bytes moved (measured on this corpus: 83 s for the join,
490 s for the groupby, vs ~8 s for this operator end to end at the same
scale). Instead each batch packs, per hash bucket, three parallel
numpy arrays — ``hash64(url)``, ``hash64(url)^h(html)`` pair-hash, and
a local host index — as single binary blob CELLS, so the exchange
carries (buckets x batches) rows of pure bytes. Each bucket task then
diffs its two sides with vectorized sorted-array intersections
(``np.intersect1d``) and emits a per-host partial count table; a final
host-keyed reduce is bounded by host count. Partitioning assumptions:
URLs are unique within a snapshot (crawl-result invariant), and a
bucket's keys fit one task (pick ``num_buckets`` ~ n/5e7 at 10^10
URLs). Identity is 64-bit hashed — the same truncated-digest contract
as ``state/seen.py`` (expected cross-snapshot collisions n^2/2^64,
~5 counts in 10^10; the exact-byte DuckDB oracle confirms zero on the
test corpora).

``recrawl_snapshot`` synthesises the deterministic second snapshot the
board query diffs against (no external data in this environment): per
URL, the first hex char of ``md5(url)`` picks the fate — '0'-'3'
content changed, '4' page vanished, '5' spawns an additional
``?v=2`` URL, the rest byte-identical. The same rule is expressed in
the DuckDB oracle, which constructs snapshot B independently and diffs
by raw BLOB equality, so the comparison cross-checks the whole detect
path, not the construction rule.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "recrawl_snapshot",
    "change_detect",
    "priority_update",
    "url_depth_hist",
    "hreflang_clusters",
    "web_training_prep",
    "host_stats",
    "mirror_hosts",
    "duplicate_titles",
    "url_templates",
    "url_quality_filter",
    "canonical_urls",
    "cross_crawl_dedup",
    "resolve_redirects",
    "soft404_pages",
    "alias_collapse",
]

_HOST_RE = r"^https://([^/]+)/"
_HASH_KEY = "chg_detect_key!!"  # 16-byte siphash key, both sides + oracle-free
_ODD = np.uint64(0x9E3779B97F4A7C15)


def recrawl_snapshot(pages_ds):
    """Deterministic snapshot B derived from snapshot A (see module doc)."""

    def perturb(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        c = np.array([hashlib.md5(u.encode("utf-8")).hexdigest()[0] for u in df["url"]])
        changed = np.isin(c, list("0123"))
        removed = c == "4"
        spawn = c == "5"
        keep = df.loc[~removed].copy()
        kc = changed[~removed]
        keep["html"] = [
            h + b"<!--recrawl-->" if f else h for h, f in zip(keep["html"], kc)
        ]
        keep.loc[kc, "warc_ts"] = keep.loc[kc, "warc_ts"] + pd.Timedelta(days=1)
        new = df.loc[spawn].copy()
        new["url"] = new["url"] + "?v=2"
        new["html"] = [h + b"<!--new-->" for h in new["html"]]
        new["warc_ts"] = new["warc_ts"] + pd.Timedelta(days=1)
        return pd.concat([keep, new], ignore_index=True)

    return pages_ds.map_batches(perturb, batch_format="pandas")


def _pack(side: str, num_buckets: int):
    """Pack one batch into per-bucket blob rows: urlh/pairh/hostidx as
    binary cells + the batch's local host list. Only these blobs cross
    the exchange — never a per-URL row."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "side": pd.Series(dtype=object),
                    "urlh": pd.Series(dtype=object),
                    "pairh": pd.Series(dtype=object),
                    "hostidx": pd.Series(dtype=object),
                    "hosts": pd.Series(dtype=object),
                }
            )
        urls = df["url"].to_numpy(dtype=object)
        urlh = pd.util.hash_array(urls, hash_key=_HASH_KEY)
        bodyh = pd.util.hash_array(df["html"].to_numpy(dtype=object), hash_key=_HASH_KEY)
        with np.errstate(over="ignore"):
            pairh = urlh * _ODD + bodyh
        hosts = df["url"].str.extract(_HOST_RE, expand=False).to_numpy(dtype=object)
        uniq_hosts, hostidx = np.unique(hosts, return_inverse=True)
        bucket = (urlh % np.uint64(num_buckets)).astype(np.int64)
        rows = []
        for bk in np.unique(bucket):
            m = bucket == bk
            rows.append(
                {
                    "bucket": int(bk),
                    "side": side,
                    "urlh": urlh[m].tobytes(),
                    "pairh": pairh[m].tobytes(),
                    "hostidx": hostidx[m].astype(np.int32).tobytes(),
                    "hosts": list(uniq_hosts),
                }
            )
        return pd.DataFrame(rows)

    return fn


def _diff_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Merge one bucket's blob rows and emit per-host partial counts."""

    # one shared host id space for both sides of the bucket
    shared: dict[str, int] = {}

    def unpack_shared(side: str):
        rows = df[df["side"] == side]
        urlhs, pairhs, gids = [], [], []
        for _, r in rows.iterrows():
            local_hosts = r["hosts"]
            lid_to_gid = np.fromiter(
                (shared.setdefault(h, len(shared)) for h in local_hosts),
                dtype=np.int64,
                count=len(local_hosts),
            )
            urlhs.append(np.frombuffer(r["urlh"], dtype=np.uint64))
            pairhs.append(np.frombuffer(r["pairh"], dtype=np.uint64))
            gids.append(
                lid_to_gid[np.frombuffer(r["hostidx"], dtype=np.int32)]
                if len(local_hosts)
                else np.zeros(0, np.int64)
            )
        if not urlhs:
            z = np.zeros(0, np.uint64)
            return z, z.copy(), np.zeros(0, np.int64)
        return np.concatenate(urlhs), np.concatenate(pairhs), np.concatenate(gids)

    ua, pa, ga = unpack_shared("a")
    ub, pb, gb = unpack_shared("b")
    n_hosts = len(shared)
    if n_hosts == 0:
        return pd.DataFrame(
            {
                "host": pd.Series(dtype=object),
                "n_unchanged": pd.Series(dtype="int64"),
                "n_changed": pd.Series(dtype="int64"),
                "n_added": pd.Series(dtype="int64"),
                "n_removed": pd.Series(dtype="int64"),
            }
        )

    oa = np.argsort(ua)
    ua_s, ga_s = ua[oa], ga[oa]
    ob = np.argsort(ub)
    ub_s, gb_s = ub[ob], gb[ob]
    # urls in both snapshots (unique per side by crawl invariant)
    common, ia, _ = np.intersect1d(ua_s, ub_s, assume_unique=True, return_indices=True)
    common_per_host = np.bincount(ga_s[ia], minlength=n_hosts)
    # (url, sha) pairs identical on both sides = unchanged
    oa2 = np.argsort(pa)
    _, ipa, _ = np.intersect1d(pa[oa2], np.sort(pb), assume_unique=True, return_indices=True)
    unchanged_per_host = np.bincount(ga[oa2][ipa], minlength=n_hosts)
    a_per_host = np.bincount(ga, minlength=n_hosts)
    b_per_host = np.bincount(gb, minlength=n_hosts)
    hosts_arr = np.empty(n_hosts, dtype=object)
    for h, i in shared.items():
        hosts_arr[i] = h
    return pd.DataFrame(
        {
            "host": hosts_arr,
            "n_unchanged": unchanged_per_host.astype("int64"),
            "n_changed": (common_per_host - unchanged_per_host).astype("int64"),
            "n_added": (b_per_host - common_per_host).astype("int64"),
            "n_removed": (a_per_host - common_per_host).astype("int64"),
        }
    )


# snapshots at or below this URL count take the broadcast diff: A's
# (urlhash, pairhash) arrays are 16 B/url (30M -> 480 MB once in
# plasma, zero-copy to every B task), and the bucket exchange's fixed
# all-to-all machinery (~10 s however small the blobs) disappears.
# Above it, the blob-packed bucket exchange below is the scale path.
_BROADCAST_URLS = 30_000_000


def _hash_batch(df: pd.DataFrame):
    """(urlh, pairh, host) for one batch — the shared identity kernel
    of both diff paths (same key/odd-multiplier contract as ``_pack``)."""
    urls = df["url"].to_numpy(dtype=object)
    urlh = pd.util.hash_array(urls, hash_key=_HASH_KEY)
    bodyh = pd.util.hash_array(df["html"].to_numpy(dtype=object), hash_key=_HASH_KEY)
    with np.errstate(over="ignore"):
        pairh = urlh * _ODD + bodyh
    hosts = df["url"].str.extract(_HOST_RE, expand=False).to_numpy(dtype=object)
    return urlh, pairh, hosts


def _change_detect_broadcast(a_ds, b_ds):
    """Broadcast diff: ONE streaming pass per side, no exchange.

    Pass A emits per-batch hash blobs + per-host counts; the driver
    concatenates the bounded (<= _BROADCAST_URLS x 16 B) arrays, sorts
    them once, and ``ray.put``s them. Pass B probes both sorted arrays
    with vectorized searchsorted and emits per-host partial counts;
    the per-host fold is bounded by host count x batches."""
    import ray

    def a_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"urlh": pd.Series(dtype=object), "pairh": pd.Series(dtype=object), "hosts": pd.Series(dtype=object), "host_n": pd.Series(dtype=object)})
        urlh, pairh, hosts = _hash_batch(df)
        uh, counts = np.unique(hosts, return_counts=True)
        return pd.DataFrame(
            {
                "urlh": [urlh.tobytes()],
                "pairh": [pairh.tobytes()],
                "hosts": [list(uh)],
                "host_n": [counts.astype(np.int64).tobytes()],
            }
        )

    a_host: dict[str, int] = {}
    urlhs, pairhs = [], []
    for b in a_ds.map_batches(a_partial, batch_format="pandas", batch_size=8192).iter_batches(
        batch_format="pandas"
    ):
        for _, r in b.iterrows():
            urlhs.append(np.frombuffer(r["urlh"], dtype=np.uint64))
            pairhs.append(np.frombuffer(r["pairh"], dtype=np.uint64))
            for h, n in zip(r["hosts"], np.frombuffer(r["host_n"], dtype=np.int64)):
                a_host[h] = a_host.get(h, 0) + int(n)
    ua = np.sort(np.concatenate(urlhs)) if urlhs else np.zeros(0, np.uint64)
    pa = np.sort(np.concatenate(pairhs)) if pairhs else np.zeros(0, np.uint64)
    a_ref = ray.put((ua, pa))

    def b_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "host": pd.Series(dtype=object),
                "n_b": pd.Series(dtype="int64"),
                "n_common": pd.Series(dtype="int64"),
                "n_unchanged": pd.Series(dtype="int64"),
            }
        )
        if not len(df):
            return empty
        ua_s, pa_s = ray.get(a_ref)

        def member(sorted_arr, v):
            if not len(sorted_arr):
                return np.zeros(len(v), dtype=bool)
            i = np.searchsorted(sorted_arr, v)
            return (i < len(sorted_arr)) & (sorted_arr[np.minimum(i, len(sorted_arr) - 1)] == v)

        urlh, pairh, hosts = _hash_batch(df)
        common = member(ua_s, urlh)
        unchanged = member(pa_s, pairh)
        uh, codes = np.unique(hosts, return_inverse=True)
        return pd.DataFrame(
            {
                "host": uh,
                "n_b": np.bincount(codes, minlength=len(uh)).astype("int64"),
                "n_common": np.bincount(codes, weights=common, minlength=len(uh)).astype("int64"),
                "n_unchanged": np.bincount(codes, weights=unchanged, minlength=len(uh)).astype("int64"),
            }
        )

    parts = pd.DataFrame(
        b_ds.map_batches(b_partial, batch_format="pandas", batch_size=8192).take_all()
    )
    if len(parts):
        bt = parts.groupby("host", as_index=False).sum()
    else:
        bt = pd.DataFrame({"host": [], "n_b": [], "n_common": [], "n_unchanged": []})
    rows = {h: (0, 0, 0) for h in a_host}
    for _, r in bt.iterrows():
        rows[r["host"]] = (int(r["n_b"]), int(r["n_common"]), int(r["n_unchanged"]))
    out_hosts = sorted(set(a_host) | set(rows))
    recs = []
    for h in out_hosts:
        n_b, n_common, n_unch = rows.get(h, (0, 0, 0))
        n_a = a_host.get(h, 0)
        changed = n_common - n_unch
        seen = changed + n_unch
        recs.append(
            {
                "host": h,
                "n_unchanged": n_unch,
                "n_changed": changed,
                "n_added": n_b - n_common,
                "n_removed": n_a - n_common,
                "change_rate": (changed / seen) if seen > 0 else 0.0,
            }
        )
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            recs,
            columns=["host", "n_unchanged", "n_changed", "n_added", "n_removed", "change_rate"],
        ).astype(
            {c: "int64" for c in ("n_unchanged", "n_changed", "n_added", "n_removed")}
        )
    )


def change_detect(a_ds, b_ds, num_buckets: int | None = None, broadcast_urls: int = _BROADCAST_URLS) -> pd.DataFrame:
    """Per-host change statistics between snapshots A and B.

    Returns (host, n_unchanged, n_changed, n_added, n_removed,
    change_rate) where change_rate = changed / (changed + unchanged)
    over URLs present in both snapshots (0.0 when no common URLs).

    Dispatch: snapshot A at or below ``broadcast_urls`` takes the
    zero-exchange broadcast diff (see ``_change_detect_broadcast``);
    larger snapshots take the blob-packed bucket exchange below. Both
    paths share the ``_hash_batch`` identity kernel and are
    equality-tested against each other and the byte-exact oracle."""
    from gleaner_ray.cluster import cluster_cpus

    try:
        n_a = a_ds.count()
    except Exception:  # pragma: no cover - non-dataset input
        n_a = None
    if n_a is not None and n_a <= broadcast_urls:
        return _change_detect_broadcast(a_ds, b_ds)

    if num_buckets is None:
        num_buckets = max(16, cluster_cpus(8) * 2)
    # large pack batches: the exchange row count is buckets x batches,
    # so fewer/bigger batches shrink the bucket groupby's sort work
    # (the bytes moved are the same packed blobs either way)
    packed = a_ds.map_batches(
        _pack("a", num_buckets), batch_format="pandas", batch_size=8192
    ).union(
        b_ds.map_batches(_pack("b", num_buckets), batch_format="pandas", batch_size=8192)
    )
    counts = packed.groupby("bucket").map_groups(_diff_bucket, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # bucket-partials table is (buckets x hosts)-bounded: one task
        # sums it (a distributed groupby here costs 10+ s of fixed
        # exchange machinery to reduce a few hundred rows)
        df = df.groupby("host", as_index=False).sum()
        seen = (df["n_changed"] + df["n_unchanged"]).to_numpy()
        rate = np.where(seen > 0, df["n_changed"].to_numpy() / np.maximum(seen, 1), 0.0)
        df = df.assign(change_rate=rate)
        return df.sort_values("host", ignore_index=True)

    # final division + sort over the bounded per-host table
    return counts.repartition(1).map_batches(finish, batch_size=None, batch_format="pandas")


def priority_update(frontier_ds, host_rates: pd.DataFrame, hot: float = 0.25, warm: float = 0.1):
    """Close the recrawl loop: assign each frontier URL a recrawl
    priority from its host's measured change rate (``change_detect``
    output) — the scheduling signal the north rule's priority queue
    consumes. Priority 0 = hot host (change_rate >= ``hot``), 1 = warm
    (>= ``warm``) or unknown host (no history yet -> medium), 2 = cold.

    Scale shape: the per-host rate table is bounded by host count; it
    broadcasts once via ``ray.put`` and every frontier batch assigns
    priorities with one vectorized sorted-probe — the frontier is never
    shuffled. Output: (url, host, priority)."""
    import ray

    hosts = np.sort(host_rates["host"].to_numpy(dtype=object))
    order = np.argsort(host_rates["host"].to_numpy(dtype=object))
    rates = host_rates["change_rate"].to_numpy(dtype=np.float64)[order]
    prio_by_host = np.where(rates >= hot, 0, np.where(rates >= warm, 1, 2)).astype(np.int64)
    ref = ray.put((hosts, prio_by_host))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h, p = ray.get(ref)
        host = df["url"].str.extract(_HOST_RE, expand=False).to_numpy(dtype=object)
        idx = np.searchsorted(h, host)
        known = (idx < len(h)) & (h[np.minimum(idx, max(len(h) - 1, 0))] == host)
        prio = np.where(known, p[np.minimum(idx, max(len(h) - 1, 0))], 1)
        return pd.DataFrame(
            {"url": df["url"], "host": host, "priority": prio.astype("int64")}
        )

    return frontier_ds.map_batches(assign, batch_format="pandas")


def host_stats(pages_ds, num_buckets: int | None = None) -> "pd.DataFrame":
    """Per-host crawl profile — the budgeting input a frontier planner
    consumes: page count, total body bytes, DISTINCT content count
    (mirror detection: a host serving one page under thousands of URLs
    has n_distinct << n_pages), and the crawl-window span in seconds.

    Scale shape: counts/bytes/span reduce from per-batch per-host
    partials (host-count-sized exchange); the distinct-content count
    rides the same blob-packed bucket exchange as ``change_detect`` —
    per-bucket (bodyhash, hostidx) arrays as binary cells, per-bucket
    ``np.unique`` on the combined key, per-host partial distinct counts
    (a content hash collides across buckets only if the hash collides,
    so bucket-local distinct sums are exact). Nothing per-URL crosses
    any exchange."""
    from ray.data.aggregate import Max, Min, Sum

    from gleaner_ray.cluster import cluster_cpus

    if num_buckets is None:
        num_buckets = max(16, cluster_cpus(8) * 2)

    def base_partial(df: pd.DataFrame) -> pd.DataFrame:
        host = df["url"].str.extract(_HOST_RE, expand=False)
        out = pd.DataFrame(
            {
                "host": host,
                "n_pages": 1,
                "n_bytes": [len(h or b"") for h in df["html"]],
                "ts_min": df["warc_ts"],
                "ts_max": df["warc_ts"],
            }
        )
        return out.groupby("host", as_index=False).agg(
            n_pages=("n_pages", "sum"),
            n_bytes=("n_bytes", "sum"),
            ts_min=("ts_min", "min"),
            ts_max=("ts_max", "max"),
        )

    base = (
        pages_ds.map_batches(base_partial, batch_format="pandas")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("n_bytes", alias_name="n_bytes"),
            Min("ts_min", alias_name="ts_min"),
            Max("ts_max", alias_name="ts_max"),
        )
        .to_pandas()
    )

    def pack_content(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "keys": pd.Series(dtype=object),
                    "hostidx": pd.Series(dtype=object),
                    "hosts": pd.Series(dtype=object),
                }
            )
        bodyh = pd.util.hash_array(df["html"].to_numpy(dtype=object), hash_key=_HASH_KEY)
        hosts = df["url"].str.extract(_HOST_RE, expand=False).to_numpy(dtype=object)
        uniq_hosts, hostidx = np.unique(hosts, return_inverse=True)
        bucket = (bodyh % np.uint64(num_buckets)).astype(np.int64)
        rows = []
        for bk in np.unique(bucket):
            m = bucket == bk
            rows.append(
                {
                    "bucket": int(bk),
                    "keys": bodyh[m].tobytes(),
                    "hostidx": hostidx[m].astype(np.int32).tobytes(),
                    "hosts": list(uniq_hosts),
                }
            )
        return pd.DataFrame(rows)

    def distinct_bucket(df: pd.DataFrame) -> pd.DataFrame:
        shared: dict[str, int] = {}
        keys_l, gids_l = [], []
        for _, r in df.iterrows():
            lid_to_gid = np.fromiter(
                (shared.setdefault(h, len(shared)) for h in r["hosts"]),
                dtype=np.int64,
                count=len(r["hosts"]),
            )
            keys_l.append(np.frombuffer(r["keys"], dtype=np.uint64))
            gids_l.append(lid_to_gid[np.frombuffer(r["hostidx"], dtype=np.int32)])
        if not keys_l:
            return pd.DataFrame(
                {"host": pd.Series(dtype=object), "nd": pd.Series(dtype="int64")}
            )
        keys = np.concatenate(keys_l)
        gids = np.concatenate(gids_l)
        # distinct (host, content) pairs inside the bucket: lexsort and
        # count group boundaries — exact, no combined-key collisions
        order = np.lexsort((keys, gids))
        g, k = gids[order], keys[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = (g[1:] != g[:-1]) | (k[1:] != k[:-1])
        cnt = np.bincount(g[new], minlength=len(shared))
        hosts_arr = np.empty(len(shared), dtype=object)
        for h, i in shared.items():
            hosts_arr[i] = h
        return pd.DataFrame({"host": hosts_arr, "nd": cnt.astype("int64")})

    from ray.data.aggregate import Sum as _Sum

    dist = (
        pages_ds.map_batches(pack_content, batch_format="pandas", batch_size=8192)
        .groupby("bucket")
        .map_groups(distinct_bucket, batch_format="pandas")
        .groupby("host")
        .aggregate(_Sum("nd", alias_name="n_distinct"))
        .to_pandas()
    )
    out = base.merge(dist, on="host", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["span_s"] = (
        (
            out["ts_max"].astype("datetime64[us]").astype("int64")
            - out["ts_min"].astype("datetime64[us]").astype("int64")
        )
        // 1_000_000
    ).astype("int64")
    out = out[["host", "n_pages", "n_bytes", "n_distinct", "span_s"]]
    return out.sort_values("host", ignore_index=True)


def mirror_hosts(pages_ds, num_partitions: int | None = None):
    """Cross-host mirror detection: (host_a, host_b, shared) where
    ``shared`` counts content digests served by BOTH hosts — the signal
    a frontier planner uses to crawl one replica of a mirrored site
    instead of all of them (``host_stats``'s n_distinct << n_pages is
    the intra-host variant; this is the inter-host one).

    Scale shape: one streaming pass computes ``md5(html)`` per page
    (per-row crypto hash, the same identity work as the reference's
    per-object SHA — reference jsonutils.go:xxx analogue) and
    pre-dedupes (digest, host) within the batch (the same per-object
    digest identity the reference computes per harvested document,
    jsonutils.go:334-356); a groupby on the digest+host key makes the
    distinct global (the shuffle carries one row per distinct content
    per host, not per page); a digest-keyed
    self-join then emits only cross-host co-occurrences, combined
    map-side to per-batch (host_a, host_b) partial counts before the
    final host-pair-sized groupby. Hosts ordered lexicographically so
    each pair appears once.
    """
    import hashlib as _hl

    import pyarrow as _pa
    import ray.data as _rd  # noqa: F401  (module import keeps parity with siblings)
    from ray.data.aggregate import Count, Sum

    from gleaner_ray.cluster import cluster_cpus

    if num_partitions is None:
        num_partitions = max(2, cluster_cpus(8))

    def digests(t: "_pa.Table") -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"h": pd.Series(dtype=object), "host": pd.Series(dtype=object)})
        html = t.column("html")
        hs = [_hl.md5(memoryview(html[i].as_buffer())).hexdigest() for i in range(t.num_rows)]
        host = pd.Series(t.column("url").to_pylist()).str.extract(_HOST_RE, expand=False)
        return pd.DataFrame({"h": hs, "host": host}).drop_duplicates()

    digest_parts = pages_ds.map_batches(digests, batch_format="pyarrow")

    # dual-path (ops.fold): under the cap the distinct (digest, host)
    # table folds on the driver and the cross-host intersection is one
    # local self-merge — no digest shuffle, no join actor pools
    from gleaner_ray.ops.fold import fold_or_reduce

    folded, digest_parts = fold_or_reduce(
        digest_parts.map_batches(
            lambda df: df.assign(_n=np.ones(len(df), dtype=np.int8)), batch_format="pandas"
        ),
        ["h", "host"],
        {"_n": "max"},
    )
    if folded is not None:
        m = folded[["h", "host"]].merge(
            folded[["h", "host"]].rename(columns={"host": "host_b"}), on="h"
        )
        m = m[m["host"] < m["host_b"]]
        out = (
            m.groupby(["host", "host_b"], as_index=False)
            .size()
            .rename(columns={"host": "host_a", "size": "shared"})
        )
        out["shared"] = out["shared"].astype("int64")
        if out.empty:
            return _rd.from_arrow(
                _pa.table(
                    {
                        "host_a": _pa.array([], _pa.string()),
                        "host_b": _pa.array([], _pa.string()),
                        "shared": _pa.array([], _pa.int64()),
                    }
                )
            )
        return _rd.from_pandas(out[["host_a", "host_b", "shared"]])

    distinct = (
        digest_parts.select_columns(["h", "host"])
        .groupby(["h", "host"])
        .aggregate(Count(alias_name="_cnt"))
        .select_columns(["h", "host"])
    )
    right = distinct.map_batches(
        lambda df: df.rename(columns={"h": "h2", "host": "host_b"}), batch_format="pandas"
    )
    joined = distinct.join(
        right, join_type="inner", num_partitions=num_partitions, on=("h",), right_on=("h2",)
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["host"] < df["host_b"]]
        if df.empty:
            return pd.DataFrame(
                {
                    "host_a": pd.Series(dtype=object),
                    "host_b": pd.Series(dtype=object),
                    "shared": pd.Series(dtype="int64"),
                }
            )
        g = df.groupby(["host", "host_b"], as_index=False).size()
        return pd.DataFrame({"host_a": g["host"], "host_b": g["host_b"], "shared": g["size"].astype("int64")})

    return (
        joined.map_batches(pairs, batch_format="pandas")
        .groupby(["host_a", "host_b"])
        .aggregate(Sum("shared", alias_name="shared"))
    )


_TITLE_RE = None  # compiled lazily (bytes pattern; module keeps pandas-only imports light)


def duplicate_titles(pages_ds):
    """(title, n_pages, first_url) for every <title> served by MORE
    than one URL — the cheap soft-duplicate signal a crawl planner
    checks before paying for content hashing: shared titles catch
    mirrors, session-id aliases and boilerplate index pages that byte
    hashing (``mirror_hosts``) only catches when bodies are identical.

    Scale shape: per-batch byte-level title extraction (no full-page
    decode on miss) folds to one (title, count, min_url) row per
    distinct title per batch; ONE title-keyed groupby takes Sum(count)
    + Min(min_url) — both combine associatively, so the result is
    exact at any parallelism — and a row-local filter keeps
    ``n_pages > 1``. The exchange carries distinct titles, not pages.
    """
    import re as _re

    import pyarrow as _pa
    from ray.data.aggregate import Min, Sum

    global _TITLE_RE
    if _TITLE_RE is None:
        _TITLE_RE = _re.compile(rb"<title>([^<]*)</title>")

    empty = pd.DataFrame(
        {
            "title": pd.Series(dtype=object),
            "n_pages": pd.Series(dtype="int64"),
            "first_url": pd.Series(dtype=object),
        }
    )

    def fold(t: "_pa.Table") -> pd.DataFrame:
        if t.num_rows == 0:
            return empty
        html = t.column("html")
        urls = t.column("url").to_pylist()
        ts: list[str] = []
        us: list[str] = []
        for i in range(t.num_rows):
            m = _TITLE_RE.search(memoryview(html[i].as_buffer()))
            if m is not None:
                ts.append(bytes(m.group(1)).decode())
                us.append(urls[i])
        if not ts:
            return empty
        g = (
            pd.DataFrame({"title": ts, "first_url": us})
            .groupby("title", as_index=False)
            .agg(n_pages=("first_url", "size"), first_url=("first_url", "min"))
        )
        g["n_pages"] = g["n_pages"].astype("int64")
        return g[["title", "n_pages", "first_url"]]

    parts = pages_ds.map_batches(fold, batch_format="pyarrow")

    # dual-path reduce (ops.fold): Sum and Min both commute, so the
    # distinct-title table folds on the driver under the cap; the
    # distributed groupby remains the wide-corpus fallback
    from gleaner_ray.ops.fold import fold_or_reduce

    import ray.data as _rd

    folded, parts = fold_or_reduce(parts, ["title"], {"n_pages": "sum", "first_url": "min"})
    if folded is not None:
        out = folded[folded["n_pages"] > 1].reset_index(drop=True)
        if out.empty:
            return _rd.from_arrow(
                _pa.table(
                    {
                        "title": _pa.array([], _pa.string()),
                        "n_pages": _pa.array([], _pa.int64()),
                        "first_url": _pa.array([], _pa.string()),
                    }
                )
            )
        return _rd.from_pandas(out.astype({"n_pages": "int64"}))

    agg = parts.groupby("title").aggregate(
        Sum("n_pages", alias_name="n_pages"), Min("first_url", alias_name="first_url")
    )

    def keep(t: "_pa.Table") -> "_pa.Table":
        import pyarrow.compute as pc

        return t.filter(pc.greater(t.column("n_pages"), _pa.scalar(1)))

    return agg.map_batches(keep, batch_format="pyarrow")


# URL-template normalization chain (spider-trap / URL-explosion mining).
# RE2-compatible, no lookaround: consecutive variable segments share
# their '/' so each segment pattern is applied TWICE (the second pass
# catches the odd positions the first one's consumed slash skipped) —
# both engines run the identical fixed chain, so templates are
# byte-identical. Digits collapse first; the hex rule then only sees
# letter-bearing segments.
_TPL_CHAIN = (
    (r"/[0-9]+/", "/{n}/"),
    (r"/[0-9]+/", "/{n}/"),
    (r"/[0-9]+$", "/{n}"),
    (r"/[0-9a-f]{8,}/", "/{x}/"),
    (r"/[0-9a-f]{8,}/", "/{x}/"),
    (r"/[0-9a-f]{8,}$", "/{x}"),
)


def url_templates(pages_ds, trap_threshold: int = 1000):
    """URL template mining — the crawler's spider-trap / URL-explosion
    detector (infinite calendars, session ids, pagination): collapse
    numeric and long-hex path segments into placeholders and count URLs
    per (host, template). A template whose URL count reaches
    ``trap_threshold`` marks a likely crawl trap the frontier should
    budget-cap (the link-structure complement of
    ``ops/sampling.domain_cap``'s per-domain quota).

    Scale shape: template extraction is row-local C-regex passes; the
    reduce carries template-vocabulary-sized partials, never per-URL
    rows, and is dual-path (``ops.fold.fold_reduce``): driver fold
    under the distinct-template cap, (host, template)-keyed distributed
    groupby-Sum beyond it."""
    from ray.data.aggregate import Sum

    from gleaner_ray.ops.fold import fold_or_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["url"]
        for pat, repl in _TPL_CHAIN:
            t = t.str.replace(pat, repl, regex=True)
        g = (
            pd.DataFrame({"host": df["url"].str.extract(_HOST_RE, expand=False), "template": t})
            .groupby(["host", "template"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g

    parts = pages_ds.map_batches(partial, batch_format="pandas")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_urls"] = df["n_urls"].astype("int64")
        df["trap"] = df["n_urls"] >= trap_threshold
        return df

    folded, parts = fold_or_reduce(parts, ["host", "template"], {"n": "sum"})
    if folded is not None:
        import pyarrow as _pa
        import ray.data as _rd

        out = flag(folded.rename(columns={"n": "n_urls"}))
        if out.empty:
            return _rd.from_arrow(
                _pa.table(
                    {
                        "host": _pa.array([], _pa.string()),
                        "template": _pa.array([], _pa.string()),
                        "n_urls": _pa.array([], _pa.int64()),
                        "trap": _pa.array([], _pa.bool_()),
                    }
                )
            )
        return _rd.from_pandas(out)

    agg = parts.groupby(["host", "template"]).aggregate(Sum("n", alias_name="n_urls"))
    return agg.map_batches(flag, batch_format="pandas")


def url_quality_filter(
    pages_ds,
    blocked_hosts: tuple[str, ...] = ("h3.example.org",),
    banned_substrings: tuple[str, ...] = ("/dup/",),
    max_len: int = 120,
    digit_den: int = 5,
):
    """RefinedWeb-style URL-level admission gate (Penedo et al. 2023
    §"URL filtering"): drop a URL before fetching anything when the URL
    alone disqualifies it — blocked host, banned path fragment,
    digit-heavy URL (>= 1/digit_den digits, spider-trap smell), or
    over-long URL. The cheapest filter in the whole pipeline: it runs
    on the frontier BEFORE fetch/extract, so every dropped row saves a
    network+parse downstream.

    First matching rule wins (host > banned > digits > length), so the
    emitted ``reason`` is deterministic. Row-local, fully vectorized
    (one compiled-regex pass per rule), zero exchange; the blocklists
    broadcast with the closure (at production scale ship a large
    domain blocklist via ``ray.put`` and probe a sorted array, same
    shape as ``ops/dedup.decontaminate``)."""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        u = df["url"].astype(str)
        host = u.str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", expand=False).fillna("")
        digits = u.str.count(r"[0-9]").astype("int64").to_numpy()
        ln = u.str.len().astype("int64").to_numpy()
        reason = np.full(len(df), "ok", dtype=object)
        reason[ln > max_len] = "too_long"
        reason[digit_den * digits >= ln] = "digit_heavy"
        banned = np.zeros(len(df), dtype=bool)
        for s in banned_substrings:
            banned |= u.str.contains(s, regex=False).to_numpy()
        reason[banned] = "banned_path"
        reason[host.isin(blocked_hosts).to_numpy()] = "blocked_host"
        return pd.DataFrame({"url": u, "keep": reason == "ok", "reason": reason})

    return pages_ds.map_batches(gate, batch_format="pandas")


def canonical_urls(pages_ds):
    """``rel=canonical`` resolution + canonical-cluster dedup — the
    crawler-side duplicate collapse the page itself declares (mirrors,
    per-site master copies; reference analogue: the URL-identity
    cleanup gleaner does before SHA naming, here at the declared-URL
    level).  A page with ``<link rel="canonical" href=...>`` joins the
    cluster of that target; pages without the tag are their own
    canonical.  Per cluster the keeper is the page whose url IS the
    canonical target when that page was crawled, else the smallest url
    (deterministic fallback when the declared target has no page row).

    Output: ``(url, canonical, keep_canon)``.

    Scale shape: the tag extract is one vectorized regex pass over the
    html batch (row-local); the only exchange is keyed on ``canonical``
    and carries two string columns — payload never moves.  Cluster
    sizes are mirror/dup multiplicities (tiny); a pathological site
    declaring one canonical for millions of pages shows up as one hot
    group — salt with url-hash and recombine if observed."""

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        h = df["html"].apply(
            lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        )
        canon = h.str.extract(r'<link rel="canonical" href="([^"]+)"', expand=False)
        url = df["url"].astype(str)
        return pd.DataFrame({"url": url, "canonical": canon.fillna(url)})

    keyed = pages_ds.map_batches(extract, batch_format="pandas")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        target = df["canonical"].iloc[0]
        self_rows = df.loc[df["url"] == target, "url"]
        keeper = self_rows.min() if len(self_rows) else df["url"].min()
        out = df[["url", "canonical"]].copy()
        out["keep_canon"] = out["url"] == keeper
        return out

    return keyed.groupby("canonical").map_groups(pick, batch_format="pandas")


def cross_crawl_dedup(pages_ds, cutoff_ms: int | None = None):
    """Cross-crawl storage dedup — Common Crawl's actual revisit
    economics: a payload whose digest already exists in a PREVIOUS
    crawl's index is not re-stored; the new fetch becomes a pointer.
    Complements ``sources/warc.fetch_dedup_roles`` (within-crawl): here
    the reference set is the prior snapshot's digest index, so content
    that MOVED between URLs still dedups.

    The snapshot split is by fetch time: rows before ``cutoff_ms`` are
    the previous crawl, rows at/after are the current one (default
    cutoff = midpoint of the corpus's ts range — deterministic from the
    data, shared with the SQL oracle).

    Output: current-crawl rows ``(url, digest, dedup_prev)``.

    Scale shape: zero exchanges. The previous crawl's digest set is
    gathered as per-batch distinct partials and broadcast once via
    ``ray.put`` as a sorted array; the current crawl streams one probe
    pass (searchsorted).  Broadcast bound: O(distinct prev digests) —
    beyond driver size swap in the sharded/bloom membership of
    ``ops/dedup.decontaminate_bloom`` (same probe contract)."""
    import hashlib as _hl

    import ray
    from ray.data.aggregate import Max, Min

    def keyed(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        ts = t.column("warc_ts")
        if _pa.types.is_timestamp(ts.type):
            tms = _pc.cast(_pc.cast(ts, _pa.timestamp("ms")), _pa.int64())
        else:
            tms = _pc.cast(ts, _pa.int64())
        dig = [_hl.md5(bytes(h)).hexdigest() for h in t.column("html").to_pylist()]
        return _pa.table({"url": t.column("url"), "tms": tms, "digest": _pa.array(dig)})

    kd = pages_ds.map_batches(keyed, batch_format="pyarrow")

    if cutoff_ms is None:
        mm = kd.aggregate(Min("tms"), Max("tms"))
        cutoff_ms = (int(mm["min(tms)"]) + int(mm["max(tms)"])) // 2

    cut = int(cutoff_ms)

    def prev_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"digest": df.loc[df["tms"] < cut, "digest"].unique()})

    prev = np.unique(
        np.concatenate(
            [
                b["digest"]
                for b in kd.map_batches(prev_partial, batch_format="pandas").iter_batches(
                    batch_format="numpy"
                )
                if len(b["digest"])
            ]
            or [np.array([], dtype=object)]
        )
    )
    ref = ray.put(prev)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        p = _ray.get(ref)
        curdf = df[df["tms"] >= cut]
        d = curdf["digest"].to_numpy(dtype=object)
        if len(p):
            pos = np.searchsorted(p, d)
            hit = (pos < len(p)) & (p[np.minimum(pos, len(p) - 1)] == d)
        else:
            hit = np.zeros(len(d), dtype=bool)
        return pd.DataFrame({"url": curdf["url"], "digest": d, "dedup_prev": hit})

    return kd.map_batches(probe, batch_format="pandas")


_REFRESH_RE = r'<meta http-equiv="refresh" content="0; url=([^"]+)">'


def resolve_redirects(pages_ds, max_hops: int = 16, fold_cap: int | None = None):
    """Redirect-chain resolution — collapse every meta-refresh hop page
    to its final landing URL plus hop count, the alias-graph closure a
    crawler needs before frontier dedup (a chain a->b->c->target means
    a, b and c are all names for target; Common Crawl resolves 3xx
    chains the same way before counting a capture).

    Output: one row per redirect page, ``(url, final_url, hops)``;
    chains longer than ``max_hops`` (a redirect loop) resolve to the
    last URL reached with ``hops = max_hops`` — accounted, not dropped.

    Scale shape: the hop extract is one vectorized regex pass (row
    local); only (src, next) pairs leave the map side, so the working
    set is bounded by redirect volume, a small fraction of the corpus.
    Under the driver cap the chain closure is pointer DOUBLING over
    sorted numpy arrays (log2(longest chain) rounds, no per-row
    Python); past it, the same doubling runs as self-joins of the edge
    Dataset keyed on the current target (each round squares the
    resolved distance — ceil(log2(max_hops)) exchanges bounded by edge
    count, payload-free). Both paths are equality-tested by forcing
    the cap in the unit test."""
    import ray.data as rd

    from gleaner_ray.ops.fold import DRIVER_KEYS, fold_or_reduce

    cap = DRIVER_KEYS if fold_cap is None else fold_cap

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        h = df["html"].apply(
            lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        )
        nxt = h.str.extract(_REFRESH_RE, expand=False)
        sel = nxt.notna()
        return pd.DataFrame(
            {"src": df["url"].astype(str)[sel], "nxt": nxt[sel], "one": np.ones(int(sel.sum()), dtype=np.int64)}
        )

    edges_ds = pages_ds.map_batches(extract, batch_format="pandas")
    # "min" over a single occurrence per src is the identity merge; the
    # fold machinery only needs an associative combine
    folded, parts = fold_or_reduce(edges_ds, ["src"], {"nxt": "min", "one": "min"}, cap)

    empty = pd.DataFrame(
        {
            "url": pd.Series(dtype=str),
            "final_url": pd.Series(dtype=str),
            "hops": pd.Series(dtype="int64"),
        }
    )

    if folded is not None:
        if folded.empty:
            return rd.from_pandas(empty)
        srcs = np.sort(folded["src"].to_numpy(dtype=object))
        order = np.argsort(folded["src"].to_numpy(dtype=object))
        nxts = folded["nxt"].to_numpy(dtype=object)[order]
        # pointer doubling: (final, hops) per source; each round jumps
        # every unresolved pointer by its target's current distance
        final = nxts.copy()
        hops = np.ones(len(srcs), dtype=np.int64)
        for _ in range(max(1, int(np.ceil(np.log2(max(max_hops, 2)))))):
            pos = np.searchsorted(srcs, final)
            pos_c = np.minimum(pos, len(srcs) - 1)
            hit = (srcs[pos_c] == final) & (hops < max_hops)
            if not hit.any():
                break
            final[hit] = final[pos_c[hit]]
            hops[hit] = np.minimum(hops[hit] + hops[pos_c[hit]], max_hops)
        return rd.from_pandas(
            pd.DataFrame({"url": srcs, "final_url": final, "hops": hops})
        )

    # distributed fallback: iterate doubling rounds as hash joins of the
    # state against the (redirect-only) edge table — bounded by edge
    # count per round, payload-free
    state = parts.map_batches(
        lambda df: pd.DataFrame(
            {"url": df["src"], "final_url": df["nxt"], "hops": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    ).materialize()
    jump = state
    for _ in range(max(1, int(np.ceil(np.log2(max(max_hops, 2)))))):
        joined = state.join(
            jump.map_batches(
                lambda df: df.rename(columns={"url": "final_url", "final_url": "jf", "hops": "jh"}),
                batch_format="pandas",
            ),
            join_type="left_outer",
            num_partitions=max(8, state.count() // 500_000 + 1),
            on=("final_url",),
        )

        def step(df: pd.DataFrame) -> pd.DataFrame:
            hit = df["jf"].notna() & (df["hops"] < max_hops)
            fu = df["final_url"].where(~hit, df["jf"])
            hp = df["hops"].where(~hit, np.minimum(df["hops"] + df["jh"].fillna(0).astype("int64"), max_hops))
            return pd.DataFrame({"url": df["url"], "final_url": fu, "hops": hp.astype("int64")})

        state = joined.map_batches(step, batch_format="pandas").materialize()
        jump = state
    return state


_404_TITLE_RE = r"(?i)<title>[^<]*(?:404|not found|does not exist)[^<]*</title>"
_404_PHRASE = "page you requested was not found"


def soft404_pages(pages_ds):
    """Soft-404 detection: pages served as 200s whose content says
    "not found" — the crawl-waste signal (storage, recrawl budget,
    training-data pollution all pay for them; cf. Bar-Yossef et al.,
    "Sic transit gloria telae", WWW 2004). A page is flagged when its
    TITLE carries a not-found marker (404 / "not found" / "does not
    exist") or its body contains the canonical apology phrase; pages
    that merely discuss 404s in prose stay clean (title rule, not a
    bag-of-words).

    Output: flagged rows only, ``(url, reason)`` with reason
    'title' | 'body' (title wins when both match).

    Scale shape: row-local — two compiled-regex / substring passes per
    batch, zero exchange; runs as a streaming filter ahead of the
    storage sink."""

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        h = df["html"].apply(
            lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        )
        t_hit = h.str.contains(_404_TITLE_RE, regex=True)
        b_hit = h.str.lower().str.contains(_404_PHRASE, regex=False)
        keep = t_hit | b_hit
        reason = np.where(t_hit, "title", "body")
        out = pd.DataFrame({"url": df["url"].astype(str), "reason": reason})
        return out[keep.to_numpy()]

    return pages_ds.map_batches(flag, batch_format="pandas")


def alias_collapse(pages_ds, fold_cap: int | None = None):
    """URL alias collapse — the composition of the two alias relations
    a crawler must close over before frontier dedup: redirect hops
    (:func:`resolve_redirects`) and declared ``rel=canonical`` targets
    (:func:`canonical_urls`). For every page: follow its redirect chain
    to the landing URL (identity for non-redirects), then adopt that
    landing page's declared canonical if it has one. alias(u) =
    canonical(redirect_final(u)).

    Output: ``(url, alias)`` for EVERY page (self-aliased pages
    included) — group by ``alias`` downstream to dedup the frontier.

    Scale shape — dual path, gated on BOTH side tables: redirect pages
    and canonical-declaring pages are small corpus fractions, so while
    each stays under ``fold_cap`` it folds map-side and broadcasts as
    sorted arrays, then ONE streaming pass probes both with
    searchsorted — the corpus never shuffles. When EITHER side exceeds
    the cap the whole composition runs distributed as two left-outer
    hash joins of the narrow url column against the (materialized)
    side tables — no driver pull, no silent degradation; both paths
    are equality-tested by forcing the cap in the unit test."""
    import ray
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Min

    from gleaner_ray.ops.fold import DRIVER_KEYS, fold_or_reduce

    if fold_cap is None:
        fold_cap = DRIVER_KEYS

    # redirect closure (bounded by redirect-page volume; resolve has
    # its own capped dual path internally)
    redir_ds = resolve_redirects(pages_ds, fold_cap=fold_cap).materialize()
    n_redir = redir_ds.count()

    # canonical declarations (bounded: declaring pages only)
    def canon_extract(df: pd.DataFrame) -> pd.DataFrame:
        h = df["html"].apply(
            lambda b: b.decode("utf-8", "replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        )
        c = h.str.extract(r'<link rel="canonical" href="([^"]+)"', expand=False)
        sel = c.notna()
        return pd.DataFrame({"curl": df["url"].astype(str)[sel], "c": c[sel], "one": np.ones(int(sel.sum()), dtype=np.int64)})

    folded, canon_parts = fold_or_reduce(
        pages_ds.map_batches(canon_extract, batch_format="pandas"),
        ["curl"],
        {"c": "min", "one": "min"},
        fold_cap,
    )

    if folded is not None and n_redir <= fold_cap:
        # broadcast path: both side tables under the cap
        redir = redir_ds.to_pandas()
        r_src = np.sort(redir["url"].to_numpy(dtype=object))
        r_fin = redir["final_url"].to_numpy(dtype=object)[
            np.argsort(redir["url"].to_numpy(dtype=object))
        ]
        if folded.empty:
            c_url = np.array([], dtype=object)
            c_tgt = np.array([], dtype=object)
        else:
            order = np.argsort(folded["curl"].to_numpy(dtype=object))
            c_url = folded["curl"].to_numpy(dtype=object)[order]
            c_tgt = folded["c"].to_numpy(dtype=object)[order]

        ref = ray.put((r_src, r_fin, c_url, c_tgt))

        def probe(df: pd.DataFrame) -> pd.DataFrame:
            rs, rf, cu, ct = ray.get(ref)
            u = df["url"].to_numpy(dtype=object)
            alias = u.copy()
            if len(rs):
                pos = np.minimum(np.searchsorted(rs, u), len(rs) - 1)
                hit = rs[pos] == u
                alias[hit] = rf[pos[hit]]
            if len(cu):
                pos = np.minimum(np.searchsorted(cu, alias), len(cu) - 1)
                hit = cu[pos] == alias
                alias[hit] = ct[pos[hit]]
            return pd.DataFrame({"url": df["url"].astype(str), "alias": alias})

        return pages_ds.map_batches(probe, batch_format="pandas")

    # beyond-cap path: the documented two-left-join composition. The
    # canonical side reduces distributed (groupby-Min over the
    # materialized partials — same arbitration as the fold) and only
    # narrow (url, alias) rows ever move.
    canon_tbl = (
        rd.from_pandas(folded[["curl", "c"]].reset_index(drop=True))
        if folded is not None and not folded.empty
        else canon_parts.groupby("curl").aggregate(Min("c", alias_name="c"))
    ).materialize()
    n_canon = canon_tbl.count()
    width = max(8, n_redir // 500_000 + 1)

    urls = pages_ds.map_batches(
        lambda df: pd.DataFrame({"url": df["url"].astype(str)}), batch_format="pandas"
    )
    step1 = urls
    if n_redir:
        j1 = urls.join(
            redir_ds.map_batches(
                lambda df: pd.DataFrame({"r_url": df["url"], "final_url": df["final_url"]}),
                batch_format="pandas",
            ),
            join_type="left_outer",
            num_partitions=width,
            on=("url",),
            right_on=("r_url",),
        )
        step1 = j1.map_batches(
            lambda df: pd.DataFrame(
                {"url": df["url"], "alias": df["final_url"].where(df["final_url"].notna(), df["url"])}
            ),
            batch_format="pandas",
        )
    else:
        step1 = urls.map_batches(
            lambda df: pd.DataFrame({"url": df["url"], "alias": df["url"]}),
            batch_format="pandas",
        )
    if not n_canon:
        return step1
    j2 = step1.join(
        canon_tbl,
        join_type="left_outer",
        num_partitions=width,
        on=("alias",),
        right_on=("curl",),
    )
    return j2.map_batches(
        lambda df: pd.DataFrame(
            {"url": df["url"], "alias": df["c"].where(df["c"].notna(), df["alias"])}
        ),
        batch_format="pandas",
    )


def url_depth_hist(pages_ds) -> "rd.Dataset":
    """Per-host URL path-depth histogram: depth = path segments after
    the host (``https://h/a/b`` -> 2) — the frontier depth-budgeting
    diagnostic (depth caps are the cheapest spider-trap guard; this is
    the table that says where a host's URL mass actually lives, cf.
    ``url_templates`` for the per-template view).

    Row-local vectorized count('/') per batch, (host, depth) partial
    combine, dual-path fold — URLs never shuffle."""
    import ray.data as rd

    from gleaner_ray.ops.fold import fold_or_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "host": pd.Series(dtype=object),
                    "depth": pd.Series(dtype="int64"),
                    "n_urls": pd.Series(dtype="int64"),
                }
            )
        u = df["url"].astype(str)
        host = u.str.split("/", n=3).str[2]
        depth = (u.str.count("/") - 2).astype("int64")
        g = (
            pd.DataFrame({"host": host, "depth": depth})
            .groupby(["host", "depth"], as_index=False)
            .agg(n_urls=("depth", "size"))
        )
        return g.astype({"n_urls": "int64"})

    parts = pages_ds.map_batches(partial, batch_format="pandas")
    folded, parts = fold_or_reduce(parts, ["host", "depth"], {"n_urls": "sum"})
    if folded is not None:
        return rd.from_pandas(
            folded.sort_values(["host", "depth"], ignore_index=True).astype(
                {"depth": "int64", "n_urls": "int64"}
            )
        )
    from ray.data.aggregate import Sum

    return parts.groupby(["host", "depth"]).aggregate(Sum("n_urls", alias_name="n_urls"))


_HREFLANG_RE = re.compile(rb'<link rel="alternate" hreflang="[^"]+" href="([^"]+)">')


def hreflang_clusters(pages_ds) -> "rd.Dataset":
    """i18n alternate-cluster resolution: pages tied together by
    ``<link rel="alternate" hreflang=...>`` annotations form one
    logical document in N languages — the cluster a frontier dedupes
    against (crawl every variant once, never re-discover them as
    "new" URLs) and a corpus builder keeps exactly one of per target
    language. Real-web annotations are often ONE-WAY (only the primary
    page lists its variants), so the grouping is the connected-
    component closure over the undirected annotation edges, not tag
    symmetry — the corpus plants such partial clusters.

    Output: (url, cluster) for every url that appears in any
    annotation (source or target), cluster = lexicographic min member.

    Scale shape: tag extraction is row-local over the html bytes; the
    distinct (src, dst) edge table is bounded by annotation volume
    (i18n clusters, orders of magnitude below page count) and folds
    dual-path; exact union-find closure on the driver over the bounded
    edge table — the same bounded-relation-closure seam as
    ``resolve_redirects`` / ``alias_collapse``."""
    import ray.data as rd

    from gleaner_ray.ops.fold import fold_or_reduce

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "src": pd.Series(dtype=object),
            "dst": pd.Series(dtype=object),
            "_n": pd.Series(dtype="int8"),
        }
        if df.empty:
            return pd.DataFrame(cols)
        srcs, dsts = [], []
        for url, html in zip(df["url"], df["html"]):
            for m in _HREFLANG_RE.findall(bytes(html)):
                d = m.decode("utf-8", "surrogateescape")
                if d != url:
                    srcs.append(url)
                    dsts.append(d)
        out = pd.DataFrame({"src": srcs, "dst": dsts}).drop_duplicates()
        return out.assign(_n=np.ones(len(out), dtype=np.int8))

    parts = pages_ds.map_batches(edges, batch_format="pandas")
    folded, parts = fold_or_reduce(parts, ["src", "dst"], {"_n": "max"})
    if folded is None:
        from ray.data.aggregate import Max

        folded = (
            parts.groupby(["src", "dst"]).aggregate(Max("_n", alias_name="_n")).to_pandas()
        )
    if folded.empty:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "cluster": pa.array([], pa.string())})
        )
    nodes = sorted(set(folded["src"]) | set(folded["dst"]))
    idx = {u: i for i, u in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(folded["src"], folded["dst"]):
        a, b = find(idx[s]), find(idx[d])
        if a != b:
            parent[max(a, b)] = min(a, b)  # nodes sorted: min index = min url
    roots = [find(i) for i in range(len(nodes))]
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(nodes, pa.string()),
                "cluster": pa.array([nodes[r] for r in roots], pa.string()),
            }
        )
    )


def web_training_prep(pages_ds, min_chars: int = 80, frac: float = 0.9, num_buckets: int = 256):
    """Flagship crawl-plane training-data pipeline — raw page bytes to
    a split-labeled training corpus in one composition (the
    RefinedWeb/C4 shape, starting from the pages table instead of a
    pre-extracted documents plane; ``tx.training_data_prep`` is the
    docs-plane sibling):

    visible-text extraction (row-local regex chain) → length gate
    (``n_chars >= min_chars``) → exact content dedup (md5 identity,
    ``MIN(url)`` keep-first — the reference's per-object digest rule,
    jsonutils.go:334-356, applied corpus-wide) → deterministic
    md5-coin train/holdout split (the ``hash_split`` contract, same
    threshold literal both engines).

    Scale shape: extraction and gating stream row-local. Keep-first
    arbitration is the module's BUCKET exchange (see ``change_detect``'s
    module doc): each batch pre-combines one (h, min url, n_chars) row
    per distinct digest and tags it with the digest's first byte, so
    the only shuffle is a ``num_buckets``-keyed map_groups whose local
    min finishes each bucket — a 1.2M-row string-keyed groupby-Min
    took 87 s on the same input (Ray hash-shuffle aggregator cost
    scales with DISTINCT keys, not rows); the bucket plan runs the
    whole pipeline in ~8 s at sf0.1/32cpus. No winner join-back:
    byte-identical content has identical ``n_chars``, so the keeper
    row is emitted whole. At 10^10 pages raise ``num_buckets`` so one
    bucket's distinct digests fit a group task. Output
    (url, h, n_chars, split), one row per distinct surviving
    content."""
    from gleaner_ray.ops.sampling import split_threshold_hex
    from gleaner_ray.ops.text import html_visible_text

    thresh = split_threshold_hex(frac)
    v = html_visible_text(pages_ds)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_chars"] >= min_chars]
        empty = pd.DataFrame(
            {
                "bucket": pd.Series(dtype="int64"),
                "h": pd.Series(dtype=object),
                "url": pd.Series(dtype=object),
                "n_chars": pd.Series(dtype="int64"),
            }
        )
        if df.empty:
            return empty
        digs = [hashlib.md5(t.encode()).digest() for t in df["text_clean"]]
        g = (
            pd.DataFrame(
                {
                    "bucket": np.fromiter((d[0] for d in digs), dtype=np.int64, count=len(digs))
                    % num_buckets,
                    "h": [d.hex() for d in digs],
                    "url": df["url"].to_numpy(),
                    "n_chars": df["n_chars"].astype("int64").to_numpy(),
                }
            )
            .groupby(["bucket", "h"], as_index=False)
            .min()
        )
        return g.astype({"bucket": "int64", "n_chars": "int64"})

    parts = v.map_batches(gate, batch_format="pandas")

    def bucket_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False).agg(url=("url", "min"), n_chars=("n_chars", "min"))
        if g.empty:
            return pd.DataFrame(
                {
                    "url": pd.Series(dtype=object),
                    "h": pd.Series(dtype=object),
                    "n_chars": pd.Series(dtype="int64"),
                    "split": pd.Series(dtype=object),
                }
            )
        coin = [hashlib.md5(u.encode()).hexdigest() for u in g["url"]]
        split = np.where(np.asarray(coin, dtype=object) < thresh, "train", "holdout")
        return pd.DataFrame(
            {
                "url": g["url"],
                "h": g["h"],
                "n_chars": g["n_chars"].astype("int64"),
                "split": split,
            }
        )

    return parts.groupby("bucket").map_groups(bucket_min, batch_format="pandas")
