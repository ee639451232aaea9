"""Recrawl change detection: diff two crawl snapshots of a frontier.

The reference crawls idempotently — a re-run StatObjects each sha and
skips what exists (jsonutils.go:384-388) — but it has no *scheduling*
signal for WHICH pages deserve recrawling. At 10^10 URLs that signal is
the core of crawl budgeting (cf. Cho & Garcia-Molina, "Effective page
refresh policies for web crawlers", TODS 2003): compare the content
hash of each URL across two snapshots, aggregate per host, and feed the
per-host change rate back into the frontier's priority column.

Scale shape: each side is projected to ``(url, host, sha)`` inside
``map_batches`` (payload bytes never cross the exchange — only 60-ish
bytes/URL), the diff is ONE url-keyed full-outer hash join, and the
result collapses to per-host partial counts inside ``map_batches``
before a bounded host-keyed groupby. Nothing driver-side except the
final per-host table (bounded by host count, not URL count).

``recrawl_snapshot`` synthesises the deterministic second snapshot the
board query diffs against (no external data in this environment): per
URL, the first hex char of ``md5(url)`` picks the fate — '0'-'3'
content changed, '4' page vanished, '5' spawns an additional
``?v=2`` URL, the rest byte-identical. The same rule is expressed in
the DuckDB oracle, which constructs snapshot B independently and diffs
by raw BLOB equality (the engine diffs by sha1), so the comparison
cross-checks the whole detect path, not the construction rule.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["recrawl_snapshot", "change_detect"]

_HOST_RE = r"^https://([^/]+)/"


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


def _url_sha(side: str):
    """Project a snapshot to (url, host, sha_<side>) — the only columns
    that cross the diff exchange."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url_%s" % side: df["url"],
                "host_%s" % side: df["url"].str.extract(_HOST_RE, expand=False),
                "sha_%s" % side: [
                    hashlib.sha1(h or b"").hexdigest() for h in df["html"]
                ],
            }
        )

    return fn


def change_detect(a_ds, b_ds, num_partitions: int | None = None) -> pd.DataFrame:
    """Per-host change statistics between snapshots A and B.

    Returns (host, n_unchanged, n_changed, n_added, n_removed,
    change_rate) where change_rate = changed / (changed + unchanged)
    over URLs present in both snapshots (0.0 when no common URLs)."""
    from ray.data.aggregate import Sum

    from gleaner_ray.cluster import cluster_cpus

    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    a = a_ds.map_batches(_url_sha("a"), batch_format="pandas")
    b = b_ds.map_batches(_url_sha("b"), batch_format="pandas")
    joined = a.join(
        b,
        join_type="full_outer",
        num_partitions=num_partitions,
        on=("url_a",),
        right_on=("url_b",),
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        host = df["host_a"].where(df["host_a"].notna(), df["host_b"])
        in_a = df["sha_a"].notna()
        in_b = df["sha_b"].notna()
        out = pd.DataFrame(
            {
                "host": host,
                "n_unchanged": (in_a & in_b & (df["sha_a"] == df["sha_b"])).astype("int64"),
                "n_changed": (in_a & in_b & (df["sha_a"] != df["sha_b"])).astype("int64"),
                "n_added": (~in_a & in_b).astype("int64"),
                "n_removed": (in_a & ~in_b).astype("int64"),
            }
        )
        # per-host partial combine: the groupby exchanges host-count
        # rows, not URL-count rows
        return out.groupby("host", as_index=False).sum()

    counts = (
        joined.map_batches(classify, batch_format="pandas")
        .groupby("host")
        .aggregate(
            Sum("n_unchanged", alias_name="n_unchanged"),
            Sum("n_changed", alias_name="n_changed"),
            Sum("n_added", alias_name="n_added"),
            Sum("n_removed", alias_name="n_removed"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        seen = (df["n_changed"] + df["n_unchanged"]).to_numpy()
        rate = np.where(seen > 0, df["n_changed"].to_numpy() / np.maximum(seen, 1), 0.0)
        df = df.assign(change_rate=rate)
        return df.sort_values("host", ignore_index=True)

    # final division + sort over the bounded per-host table
    return counts.repartition(1).map_batches(finish, batch_size=None, batch_format="pandas")
