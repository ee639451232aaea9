"""Web link-graph operators over the Common-Crawl-style pages table.

The reference harvests pages but never looks at the links between
them; a crawler operating at 10^10 URLs needs the link graph for
frontier prioritisation (rank seeds), mirror detection (components)
and host-level politeness budgeting (host in/out degree). Family:

- ``outlinks``       — ``<a href>`` extraction from the html bytes,
  one (src, dst) row per anchor (multigraph: duplicates kept)
- ``outlink_degree`` — per-URL out-degree computed row-locally (no
  shuffle: a page's anchors live in its own html cell)
- ``host_edges``     — host-projected edge weights with a map-side
  partial combine before the (small) host-keyed groupby
- ``indegree``       — map-side distinct-target combine, then one
  dst-keyed groupby (the exchange carries distinct targets, not edges)
- ``pagerank_int``   — k iterations of a fixed-point *integer*
  PageRank (rank scaled by BASE=10^15, floor division everywhere) so
  partial sums are order-independent and the result is bit-exact
  against the SQL oracle regardless of parallelism
- ``rank_priority``  — rank -> hot/warm/cold crawl tier (integer
  thresholds vs uniform mass), closing the frontier-scheduling loop
  from link structure the way ``recrawl.priority_update`` closes it
  from measured change rates
- ``discovered_urls`` — link targets with NO page row + ref counts:
  the next crawl wave's candidate frontier
- ``components_min_label`` — k rounds of undirected min-label
  propagation where the label IS the lexicographically smallest URL
  seen so far (string min: exact, engine/SQL identical)

Scale shape: extraction and degree are embarrassingly parallel
streaming stages. The iterative ops need a (src -> value) lookup per
round; when the node count is bounded (<= ``broadcast_nodes``) the
value column travels once via ``ray.put`` and each batch does a
vectorized searchsorted join — zero shuffles per round. Above the
bound the same round runs as edges ⨝ values hash join + Sum groupby
(the canonical distributed PageRank round); both paths share the
integer kernel and are tested for equality. Tie to the reference:
pages come from the same summoner data plane (summoner/acquire/*)
this repo's crawl path fills.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = [
    "HREF_RE",
    "PAGERANK_BASE",
    "outlinks",
    "outlink_degree",
    "anchor_texts",
    "reciprocal_links",
    "indegree",
    "host_edges",
    "host_rank",
    "host_budget",
    "host_triangles",
    "pagerank_int",
    "trustrank_int",
    "spam_mass",
    "hits_int",
    "HITS_BASE",
    "rank_priority",
    "discovered_urls",
    "components_min_label",
    "component_sizes",
    "indegree_topk",
    "depth_histogram",
    "seed_depth",
    "host_jaccard",
    "label_prop",
    "host_scc",
    "host_bowtie",
    "host_clustering",
    "avg_neighbor_degree",
    "outlink_locality",
    "assortativity",
    "reciprocity_rate",
    "lang_link_matrix",
]

# anchors only: the synthetic corpus (and real pages) carry other
# href attributes (<link rel=...>) a crawler does not enqueue
HREF_RE = re.compile(rb'<a href="([^"]+)"')

PAGERANK_BASE = 10**15  # fixed-point scale: sum of all ranks ~ BASE

# HITS fixed-point scale. Smaller than PAGERANK_BASE because the raw
# per-half-step sums multiply mass by a degree factor before the
# renormalization: int64 safety needs max_degree * BASE * dup_mult
# < 2^63, i.e. degrees up to ~9e6 at 10^12 — ample for page-level link
# degrees (host-level mega-hubs are bounded upstream by the frontier's
# host bucketing).
HITS_BASE = 10**12


def _host_of(urls: pd.Series) -> pd.Series:
    # scheme://host/path -> host; mirrors DuckDB split_part(url,'/',3)
    return urls.str.split("/", n=3).str[2]


_URL_HASH_KEY = "linkgraph_key!!!"  # 16 bytes


def _hash64(urls) -> np.ndarray:
    """uint64 siphash per URL (C-speed, vectorized). The broadcast
    graph paths key every lookup on this: np.searchsorted over uint64
    is ~100x an object-dtype string searchsorted (measured 70s -> 9s
    for 2-round PageRank on the 1.2M-page corpus). Distinct URLs
    colliding would silently merge nodes, so callers verify uniqueness
    once on the driver and fall back to the exact join path on a hit
    (expected only beyond ~10^9 nodes — past the broadcast bound
    anyway)."""
    return pd.util.hash_array(np.asarray(urls, dtype=object), hash_key=_URL_HASH_KEY)


def outlinks(pages: rd.Dataset) -> rd.Dataset:
    """(src, dst) per anchor. Byte-level findall on the html column —
    no decode of the full page, misses cost one C-level scan."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
        urls = t.column("url").to_pylist()
        html = t.column("html")
        srcs: list[str] = []
        dsts: list[str] = []
        for i, u in enumerate(urls):
            v = html[i].as_buffer()
            for m in HREF_RE.findall(memoryview(v)):
                srcs.append(u)
                dsts.append(bytes(m).decode())
        return pa.table({"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())})

    return pages.map_batches(fn, batch_format="pyarrow")


def outlink_degree(pages: rd.Dataset) -> rd.Dataset:
    """(url, out_degree) — row-local count, zero exchange."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()), "out_degree": pa.array([], pa.int64())})
        html = t.column("html")
        deg = np.empty(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):
            deg[i] = len(HREF_RE.findall(memoryview(html[i].as_buffer())))
        return pa.table({"url": t.column("url"), "out_degree": pa.array(deg)})

    return pages.map_batches(fn, batch_format="pyarrow")


# href AND inner text: the anchor-text extraction variant (text is the
# inbound relevance signal; same simple-anchor grammar as HREF_RE)
ANCHOR_RE = re.compile(rb'<a href="([^"]+)">([^<]*)</a>')


def anchor_texts(pages: rd.Dataset) -> rd.Dataset:
    """(url, n_anchors, texts): the inbound anchor-text profile per link
    target — anchor text of inbound links is the classic web relevance
    signal (it describes the target better than the target's own body;
    search engines and LLM-corpus URL-labelers both consume it).
    ``texts`` is the '|'-joined sorted distinct anchor strings,
    ``n_anchors`` the total inbound anchor count.

    Scale shape: per-batch pair extraction + a local (dst, text)
    distinct/count combine, then ONE dst-keyed ``map_groups`` exchange.
    The exchange carries one row per distinct (target, text) pair per
    batch — bounded by the anchor vocabulary, not the edge count — and
    per-group work is a tiny sort/join."""

    empty = pd.DataFrame(
        {"url": pd.Series(dtype=str), "txt": pd.Series(dtype=str), "n": pd.Series(dtype="int64")}
    )

    def pairs(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return empty
        html = t.column("html")
        dsts: list[str] = []
        txts: list[str] = []
        for i in range(t.num_rows):
            for m in ANCHOR_RE.findall(memoryview(html[i].as_buffer())):
                dsts.append(bytes(m[0]).decode())
                txts.append(bytes(m[1]).decode())
        if not dsts:
            return empty
        g = (
            pd.DataFrame({"url": dsts, "txt": txts})
            .groupby(["url", "txt"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype("int64")
        return g

    def profile(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "url": [df["url"].iloc[0]],
                "n_anchors": np.asarray([df["n"].sum()], dtype=np.int64),
                "texts": ["|".join(sorted(df["txt"].unique()))],
            }
        )

    parts = pages.map_batches(pairs, batch_format="pyarrow")
    # dual-path reduce (ops.fold): under the cap the distinct
    # (target, text) table folds on the driver and profiles assemble in
    # one sorted groupby (the map_groups fallback pays one Python call
    # per URL — correct, but only worth it past the anchor-vocabulary
    # cap)
    from .fold import fold_or_reduce

    folded, parts = fold_or_reduce(parts, ["url", "txt"], {"n": "sum"})
    if folded is not None:
        if folded.empty:
            return rd.from_arrow(
                pa.table(
                    {
                        "url": pa.array([], pa.string()),
                        "n_anchors": pa.array([], pa.int64()),
                        "texts": pa.array([], pa.string()),
                    }
                )
            )
        f = folded.sort_values(["url", "txt"], kind="stable", ignore_index=True)
        out = f.groupby("url", as_index=False, sort=False).agg(
            n_anchors=("n", "sum"), texts=("txt", "|".join)
        )
        return rd.from_pandas(out.astype({"n_anchors": "int64"}))
    return parts.groupby("url").map_groups(profile, batch_format="pandas")


def reciprocal_links(pages: rd.Dataset) -> rd.Dataset:
    """(url_a, url_b) with ``url_a < url_b`` where links exist in BOTH
    directions — the mutual-link signal (navigation pairs, link rings /
    link farms; a reciprocal edge is weak evidence of affiliation, so
    rank pipelines discount it and spam pipelines flag dense patches).

    Scale shape: per-batch distinct directed edges (self-loops dropped)
    fold into unordered (lo, hi) keys carrying fwd/rev presence bits;
    the reduce is Max of each bit — presence bits are idempotent under
    Max, so duplicate edges across batches cannot overcount. Max
    commutes, so the reduce is dual-path (``ops.fold.fold_reduce``):
    the pair table folds on the driver while distinct pairs stay under
    the cap (measured 22 s -> <1 s vs the hash-shuffle groupby at 154k
    pairs); beyond it, ONE (lo, hi)-keyed distributed groupby-Max. The
    exchange carries distinct pairs, not edges, on either path."""
    from ray.data.aggregate import Max

    from .fold import DRIVER_KEYS, fold_or_reduce

    edges = outlinks(pages)
    empty = pd.DataFrame(
        {
            "url_a": pd.Series(dtype=str),
            "url_b": pd.Series(dtype=str),
            "fwd": pd.Series(dtype="int64"),
            "rev": pd.Series(dtype="int64"),
        }
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty
        df = df[df["src"] != df["dst"]]
        if df.empty:
            return empty
        lo = df["src"].where(df["src"] < df["dst"], df["dst"])
        hi = df["dst"].where(df["src"] < df["dst"], df["src"])
        fwd = (df["src"] < df["dst"]).astype("int64")  # lo -> hi direction
        g = (
            pd.DataFrame({"url_a": lo, "url_b": hi, "fwd": fwd, "rev": 1 - fwd})
            .groupby(["url_a", "url_b"], as_index=False)
            .max()
        )
        return g

    folded, parts = fold_or_reduce(
        edges.map_batches(fold, batch_format="pandas"),
        ["url_a", "url_b"],
        {"fwd": "max", "rev": "max"},
        DRIVER_KEYS,
    )
    if folded is not None:
        out = folded.loc[
            (folded["fwd"] == 1) & (folded["rev"] == 1), ["url_a", "url_b"]
        ].reset_index(drop=True)
        if out.empty:
            return rd.from_arrow(
                pa.table({"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string())})
            )
        return rd.from_pandas(out)

    agg = parts.groupby(["url_a", "url_b"]).aggregate(
        Max("fwd", alias_name="fwd"), Max("rev", alias_name="rev")
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        both = pc.and_(
            pc.equal(t.column("fwd"), pa.scalar(1)), pc.equal(t.column("rev"), pa.scalar(1))
        )
        return t.filter(both).select(["url_a", "url_b"])

    return agg.map_batches(keep, batch_format="pyarrow")


def indegree(pages: rd.Dataset) -> rd.Dataset:
    """(url, in_degree) over link *targets* — unlike out-degree this
    needs an exchange, but the map side pre-combines to one (dst,
    count) row per distinct target per batch before the reduce, which
    carries distinct targets, not edges. The Sum reduce is dual-path
    (``ops.fold.fold_reduce``): driver fold under the distinct-target
    cap, distributed groupby-Sum beyond it. URLs with no inlinks are
    absent (same as the SQL GROUP BY)."""
    from ray.data.aggregate import Sum

    from .fold import DRIVER_KEYS, fold_or_reduce

    edges = outlinks(pages)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"url": pd.Series(dtype=str), "in_degree": pd.Series(dtype="int64")})
        g = df.groupby("dst", as_index=False).size()
        return pd.DataFrame({"url": g["dst"], "in_degree": g["size"].astype("int64")})

    folded, parts = fold_or_reduce(
        edges.map_batches(partial, batch_format="pandas"), ["url"], {"in_degree": "sum"}, DRIVER_KEYS
    )
    if folded is not None:
        if folded.empty:
            return rd.from_arrow(
                pa.table({"url": pa.array([], pa.string()), "in_degree": pa.array([], pa.int64())})
            )
        return rd.from_pandas(folded.astype({"in_degree": "int64"}))
    return parts.groupby("url").aggregate(Sum("in_degree", alias_name="in_degree"))


def host_edges(pages: rd.Dataset) -> rd.Dataset:
    """(src_host, dst_host, n_links) — partial combine inside each
    batch (one row per host pair per batch), then a tiny groupby Sum:
    the exchange carries O(hosts^2) rows, not O(edges)."""
    edges = outlinks(pages)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"src_host": pd.Series(dtype=str), "dst_host": pd.Series(dtype=str), "n_links": pd.Series(dtype="int64")})
        g = (
            df.assign(src_host=_host_of(df["src"]), dst_host=_host_of(df["dst"]))
            .groupby(["src_host", "dst_host"], as_index=False)
            .size()
            .rename(columns={"size": "n_links"})
        )
        return g

    from ray.data.aggregate import Sum

    from .fold import fold_or_reduce

    # host-pair key space is O(hosts^2) bounded: driver fold first,
    # distributed groupby-Sum as the fallback (over the SAME
    # materialized partials)
    folded, parts = fold_or_reduce(
        edges.map_batches(partial, batch_format="pandas"),
        ["src_host", "dst_host"],
        {"n_links": "sum"},
    )
    if folded is not None:
        if folded.empty:
            return rd.from_arrow(
                pa.table(
                    {
                        "src_host": pa.array([], pa.string()),
                        "dst_host": pa.array([], pa.string()),
                        "n_links": pa.array([], pa.int64()),
                    }
                )
            )
        return rd.from_pandas(folded.astype({"n_links": "int64"}))
    return parts.groupby(["src_host", "dst_host"]).aggregate(Sum("n_links", alias_name="n_links"))


def host_rank(pages: rd.Dataset, iters: int = 2, base: int = PAGERANK_BASE) -> pd.DataFrame:
    """Site-level PageRank over the weighted host graph — the
    Common-Crawl-style host ranking a frontier planner uses to budget
    whole sites (the host-granularity twin of ``pagerank_int``):

        r_0(h)     = base // N_hosts
        c(u -> v)  = (r_t(u) // W(u)) * w(u, v)   (W = total out-weight)
        r_{t+1}(v) = (3*base) // (20*N) + (17 * sum_in c) // 20

    All int64 floor arithmetic — order-independent, oracle-exact.
    Edges whose target host has no crawled page are masked (the same
    dst-resolution rule as ``pagerank_int``); intra-host self-loops are
    kept (internal navigation mass stays home, both engines agree).

    Scale shape: ``host_edges`` already reduces the edge set to
    O(hosts^2) weighted rows and this op's only other exchange is the
    distinct-host reduce, so rounds run on the driver over the bounded
    host table (~10^8 hosts on the full web: the int64 rank vector is
    0.8 GB — driver-sized; beyond, the rounds switch to the
    ``_pagerank_join`` shape on (host, rank) datasets, the documented
    seam)."""
    edges = host_edges(pages).to_pandas()  # bounded: O(hosts^2) weighted rows

    def host_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": _host_of(df["url"]).drop_duplicates()})

    crawled = np.asarray(
        sorted(
            pages.select_columns(["url"])
            .map_batches(host_partial, batch_format="pandas")
            .unique("host")
        ),
        dtype=object,
    )
    n = len(crawled)
    if n == 0:
        return pd.DataFrame({"host": pd.Series(dtype=object), "rank_fp": pd.Series(dtype="int64")})
    idx = {h: i for i, h in enumerate(crawled)}
    mask = edges["dst_host"].isin(idx).to_numpy()
    si = edges["src_host"][mask].map(idx).to_numpy(dtype=np.int64)
    di = edges["dst_host"][mask].map(idx).to_numpy(dtype=np.int64)
    w = edges["n_links"].to_numpy(np.int64)[mask]
    wsum = np.zeros(n, dtype=np.int64)
    np.add.at(wsum, si, w)
    tele = (3 * base) // (20 * n)
    ranks = np.full(n, base // n, dtype=np.int64)
    for _ in range(iters):
        per_unit = np.where(wsum > 0, ranks // np.maximum(wsum, 1), 0)
        incoming = np.zeros(n, dtype=np.int64)
        np.add.at(incoming, di, per_unit[si] * w)
        ranks = tele + (17 * incoming) // 20
    return pd.DataFrame({"host": crawled, "rank_fp": ranks})


# nodes above this count stop broadcasting the per-round value column
# and fall back to the hash-join round (kept well under a worker heap:
# 5M urls x ~60B + int64 ~ 400MB once in plasma, zero-copy to readers)
_BROADCAST_NODES = 5_000_000

# edge-id tables at or below this row count are pulled to the driver
# once (16 B/edge -> <=800 MB) and iterated locally: int64 sums commute,
# so the k rounds become O(kE) numpy add.at with ZERO extra cluster
# passes. Above it, rounds run as distributed streaming aggregations.
_DRIVER_EDGES = 50_000_000


def pagerank_int(
    pages: rd.Dataset,
    iters: int = 2,
    base: int = PAGERANK_BASE,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """k rounds of leaky fixed-point PageRank, bit-exact at any
    parallelism:

        r_0(u)   = base // N
        c_t(u)   = r_t(u) // out_degree(u)          (per out-edge)
        r_{t+1}(u) = (3*base) // (20*N) + (17 * sum_in c_t) // 20

    (damping 17/20 = 0.85; sink mass leaks, both engine and oracle
    agree). All arithmetic is int64 floor division, so sums commute
    and the oracle hash matches exactly.

    Broadcast path (node count <= broadcast_nodes): the per-round
    (url -> contribution) column ships once via ``ray.put`` as sorted
    numpy arrays; each edge batch does two searchsorted probes and
    emits per-dst partial sums — zero shuffle rounds. Beyond the
    bound, each round is the canonical edges ⨝ ranks join + Sum
    groupby; both paths share this kernel and are equality-tested.
    """
    # count() on the untransformed read uses parquet metadata (a
    # select_columns in between forces a full scan of the column)
    n_nodes = pages.count()
    node_ds = pages.select_columns(["url"])
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"url": pa.array([], pa.string()), "rank_fp": pa.array([], pa.int64())}))
    tele = (3 * base) // (20 * n_nodes)
    r0 = base // n_nodes

    if n_nodes <= broadcast_nodes:
        out = _pagerank_broadcast(pages, node_ds, n_nodes, iters, tele, r0, driver_edges)
        if out is not None:
            return out
    return _pagerank_join(node_ds, outlinks(pages), iters, tele, r0)


def trustrank_int(
    pages: rd.Dataset,
    n_seeds: int = 10,
    iters: int = 2,
    base: int = PAGERANK_BASE,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    whose teleport vector is restricted to a trusted seed set — trust
    mass flows out from the seeds along outlinks, and pages unreachable
    from them converge to zero; the ratio trust/pagerank is the classic
    link-spam-mass demotion signal for a crawl frontier.

        r_0(u)     = base // |S|                     if u in S else 0
        r_{t+1}(u) = [u in S] * (3*base)//(20*|S|) + (17 * sum_in r_t(v)//deg(v)) // 20

    All int64 floor arithmetic (damping 17/20), so sums commute and the
    SQL oracle hash-matches at any parallelism — the same kernel as
    ``pagerank_int`` with per-seed teleport.

    Seeds: the ``n_seeds`` lexicographically-smallest URLs (the
    deterministic stand-in ``seed_depth`` also uses; production would
    pass a curated whitelist). The seed list is bounded and ships by
    closure / position array — never a shuffle.

    Returns (url, trust_fp)."""
    n_nodes = pages.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "trust_fp": pa.array([], pa.int64())})
        )
    node_ds = pages.select_columns(["url"])
    seeds = _min_k_urls(node_ds, min(n_seeds, n_nodes))
    n_s = len(seeds)
    tele = (3 * base) // (20 * n_s)
    r0 = base // n_s

    if n_nodes <= broadcast_nodes:
        out = _pagerank_broadcast(
            pages, node_ds, n_nodes, iters, tele, r0, driver_edges, seeds=seeds, out_col="trust_fp"
        )
        if out is not None:
            return out
    return _pagerank_join(
        node_ds, outlinks(pages), iters, tele, r0, seeds=seeds, out_col="trust_fp"
    )


def spam_mass(
    pages: rd.Dataset,
    n_seeds: int = 10,
    iters: int = 2,
    base: int = PAGERANK_BASE,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """Relative spam mass (Gyongyi et al. 2004, §5): the fraction of a
    page's PageRank NOT accounted for by trust flowing from the seed
    set —

        spam = (rank_fp - trust_fp) / rank_fp        (one double division)

    High spam mass = rank earned from link structure the trusted core
    never endorses, the canonical link-farm demotion score. Both rank
    vectors use the same int64 fixed-point kernel, seeds are the same
    deterministic ``n_seeds`` smallest URLs as ``trustrank_int``.

    Scale shape: ON ONE edge pass — the broadcast path hashes the node
    set and extracts the int-pair edge table once, runs the uniform and
    the seeded fixed-point rounds over that same materialized table,
    and emits (url, rank_fp, trust_fp, spam) in a single streaming
    resolve; above the broadcast bound it degrades to the two join-path
    rank datasets joined once on url. Trust can exceed rank on
    seed-adjacent pages (seed teleport mass base//|S| >> base//N), so
    spam is clamped at 0 — both engine and oracle."""
    n_nodes = pages.count()
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "rank_fp": pa.array([], pa.int64()),
            "trust_fp": pa.array([], pa.int64()),
            "spam": pa.array([], pa.float64()),
        }
    )
    if n_nodes == 0:
        return rd.from_arrow(empty)
    node_ds = pages.select_columns(["url"])
    seeds = _min_k_urls(node_ds, min(n_seeds, n_nodes))
    n_s = len(seeds)
    tele_u = (3 * base) // (20 * n_nodes)
    r0_u = base // n_nodes
    tele_s = (3 * base) // (20 * n_s)
    r0_s = base // n_s

    if n_nodes <= broadcast_nodes:
        hashes = _sorted_node_hash_only(node_ds)
        if hashes is not None:
            edge_ids = pages.map_batches(
                _edge_id_stage(hashes), batch_format="pyarrow"
            ).materialize()
            # one shared prep: edge ids pull / degree table merge once
            # for BOTH walks
            run = _prepare_rounds(edge_ids, n_nodes, driver_edges)
            pr = run(tele_u, np.full(n_nodes, r0_u, dtype=np.int64), iters)
            tele_vec, init = _seed_vectors(hashes, n_nodes, tele_s, r0_s, seeds)
            tr = run(tele_vec, init, iters)
            h_ref = ray.put(hashes)
            pr_ref = ray.put(pr)
            tr_ref = ray.put(tr)

            def emit(t: pa.Table, _h=h_ref, _p=pr_ref, _t=tr_ref) -> pa.Table:
                if t.num_rows == 0:
                    return empty
                h = ray.get(_h)
                idx = np.searchsorted(h, _hash64(t.column("url").to_pandas()))
                p = ray.get(_p)[idx]
                s = ray.get(_t)[idx]
                spam = np.maximum(p - s, 0) / np.maximum(p, 1)
                return pa.table(
                    {
                        "url": t.column("url"),
                        "rank_fp": pa.array(p),
                        "trust_fp": pa.array(s),
                        "spam": pa.array(spam),
                    }
                )

            return node_ds.map_batches(emit, batch_format="pyarrow")

    # general path: the two join-path rank tables, joined once on url
    from ..cluster import cluster_cpus

    width = max(8, cluster_cpus(8))
    # extract links ONCE: both walks' internal semi-join/degree stages
    # reuse the materialized edge blocks
    edges = outlinks(pages).materialize()
    pr_ds = _pagerank_join(node_ds, edges, iters, tele_u, r0_u).materialize()
    tr_ds = _pagerank_join(
        node_ds, edges, iters, tele_s, r0_s, seeds=seeds, out_col="trust_fp"
    )
    joined = pr_ds.join(
        tr_ds.map_batches(
            lambda df: df.rename(columns={"url": "t_url"}), batch_format="pandas"
        ),
        join_type="inner",
        num_partitions=width,
        on=("url",),
        right_on=("t_url",),
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        p = df["rank_fp"].to_numpy(np.int64)
        s = df["trust_fp"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "url": df["url"],
                "rank_fp": p,
                "trust_fp": s,
                "spam": np.maximum(p - s, 0) / np.maximum(p, 1),
            }
        )

    return joined.map_batches(score, batch_format="pandas")


def _sorted_node_hashes(node_ds, n_nodes):
    """(sorted uint64 hashes, urls aligned to that order) — or None on
    a 64-bit collision between distinct URLs (caller falls back to the
    exact join path)."""
    urls = np.asarray(node_ds.to_pandas()["url"], dtype=object)
    h = _hash64(urls)
    order = np.argsort(h, kind="stable")
    hs, us = h[order], urls[order]
    if n_nodes > 1 and (hs[1:] == hs[:-1]).any():
        return None
    return hs, us


def _sorted_node_hash_only(node_ds):
    """Sorted uint64 node-hash array WITHOUT the url strings: hashing
    runs distributed and the driver pulls only the 8-byte column
    (10 MB/M nodes vs ~120 MB/M for the strings — the to_pandas of the
    url column was the single slowest pagerank phase at 1.2M pages).
    Returns None on a collision (caller falls back to the join path)."""
    hp = node_ds.map_batches(
        lambda t: pa.table({"h": pa.array(_hash64(t.column("url").to_pandas()))}),
        batch_format="pyarrow",
    )
    parts = [b["h"] for b in hp.iter_batches(batch_format="numpy")]
    h = np.concatenate(parts) if parts else np.array([], dtype=np.uint64)
    h.sort()
    if len(h) > 1 and (h[1:] == h[:-1]).any():
        return None
    return h


def _merge_partials(ds, key_col: str, val_col: str, out: np.ndarray) -> None:
    """Accumulate (key, value) partial batches into ``out`` with
    vectorized np.add.at — no driver-side pandas concat/groupby."""
    for b in ds.iter_batches(batch_format="numpy"):
        if len(b[key_col]):
            np.add.at(out, b[key_col].astype(np.int64), b[val_col].astype(np.int64))


def _edge_id_stage(hashes: np.ndarray):
    """Fused pages -> (si, di) edge-id extraction: ONE pass over the
    html bytes hashes both endpoints and resolves them against the
    broadcast sorted node-hash array — the string edge table never
    materializes (ids are 16 bytes/edge vs ~120 for the url strings).
    dst misses (targets outside the page set) are dropped, matching the
    oracle's nodes-anchored LEFT JOIN.

    A plain task function, not an actor class: the only state is a
    plasma-resident numpy array, and ``ray.get`` of it inside a task is
    a zero-copy view — tasks skip the per-execution actor-pool spin-up
    that dominated the short graph stages."""
    h_ref = ray.put(hashes)

    def edge_ids(t: pa.Table, _h_ref=h_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"si": pa.array([], pa.int64()), "di": pa.array([], pa.int64())})
        h = ray.get(_h_ref)
        urls = t.column("url").to_pylist()
        html = t.column("html")
        srcs: list[str] = []
        dsts: list[str] = []
        for i, u in enumerate(urls):
            for m in HREF_RE.findall(memoryview(html[i].as_buffer())):
                srcs.append(u)
                dsts.append(bytes(m).decode())
        if not srcs:
            return pa.table({"si": pa.array([], pa.int64()), "di": pa.array([], pa.int64())})
        sh = _hash64(srcs)
        dh = _hash64(dsts)
        si = np.searchsorted(h, sh)
        di = np.searchsorted(h, dh)
        n = len(h)
        ok = (di < n) & (h[np.minimum(di, n - 1)] == dh)
        return pa.table({"si": pa.array(si[ok].astype(np.int64)), "di": pa.array(di[ok].astype(np.int64))})

    return edge_ids


def _edge_ids_driver(pages, hashes, driver_edges=_DRIVER_EDGES):
    """Driver-local (si, di) edge-id arrays — or None when the edge
    count exceeds ``driver_edges`` (caller falls back to its
    distributed join path). The node-count gate alone does NOT bound
    this pull: 5M nodes at avg degree 100 is ~8 GB of id pairs, so the
    materialized edge table is counted (metadata, free) before
    ``to_pandas`` — the same gate :func:`_prepare_rounds` applies for
    the PageRank family."""
    ids = pages.map_batches(_edge_id_stage(hashes), batch_format="pyarrow").materialize()
    if ids.count() > driver_edges:
        return None
    idp = ids.to_pandas()
    return idp["si"].to_numpy(np.int64), idp["di"].to_numpy(np.int64)


def _prepare_rounds(edge_ids, n_nodes, driver_edges=_DRIVER_EDGES):
    """One-time setup for fixed-point walks over a materialized int-pair
    edge table; returns ``run(tele_term, init, iters) -> ranks`` so
    callers computing SEVERAL walks over the same graph (``spam_mass``:
    uniform + seeded) pull the edge ids / merge the degree table once.
    ``tele_term`` is a scalar (uniform teleport) or a per-node int64
    vector (seeded); ``init`` the round-0 ranks. Small edge tables pull
    to the driver (np.add.at rounds); larger ones stream one per-dst
    partial-sum aggregation per round — zero shuffles either way."""
    n_edges = edge_ids.count()  # metadata of the materialized table

    if n_edges <= driver_edges:
        # rounds run locally on the pulled id pairs (see _DRIVER_EDGES)
        idp = edge_ids.to_pandas()
        si = idp["si"].to_numpy(np.int64)
        di = idp["di"].to_numpy(np.int64)
        deg = np.bincount(si, minlength=n_nodes).astype(np.int64)

        def run(tele_term, init, iters):
            ranks = init
            for _ in range(iters):
                contrib = np.where(deg > 0, ranks // np.maximum(deg, 1), 0)
                incoming = np.zeros(n_nodes, dtype=np.int64)
                np.add.at(incoming, di, contrib[si])
                ranks = tele_term + (17 * incoming) // 20
            return ranks

        return run

    deg = np.zeros(n_nodes, dtype=np.int64)
    _merge_partials(
        edge_ids.map_batches(
            lambda df: df.groupby("si", as_index=False).size().rename(columns={"size": "d"}),
            batch_format="pandas",
        ),
        "si",
        "d",
        deg,
    )

    def round_fn(t: pa.Table, _c_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        contrib = ray.get(_c_ref)  # zero-copy plasma view per task
        si = t.column("si").to_numpy(zero_copy_only=False)
        di = t.column("di").to_numpy(zero_copy_only=False)
        # int64-exact per-dst partial sums (bincount would go through
        # float64; pandas int64 groupby stays exact)
        df = pd.DataFrame({"i": di, "c": contrib[si]})
        g = df.groupby("i", as_index=False)["c"].sum()
        return pa.table({"i": pa.array(g["i"].to_numpy(np.int64)), "s": pa.array(g["c"].to_numpy(np.int64))})

    def run(tele_term, init, iters):
        ranks = init
        for _ in range(iters):
            contrib = np.where(deg > 0, ranks // np.maximum(deg, 1), 0)
            c_ref = ray.put(contrib)
            incoming = np.zeros(n_nodes, dtype=np.int64)
            _merge_partials(
                edge_ids.map_batches(round_fn, batch_format="pyarrow", fn_kwargs={"_c_ref": c_ref}),
                "i",
                "s",
                incoming,
            )
            ranks = tele_term + (17 * incoming) // 20
        return ranks

    return run


def _pagerank_rounds(edge_ids, n_nodes, iters, tele_term, init, driver_edges=_DRIVER_EDGES):
    return _prepare_rounds(edge_ids, n_nodes, driver_edges)(tele_term, init, iters)


def _seed_vectors(hashes, n_nodes, tele, r0, seeds):
    """(tele_term, init) for a seeded (TrustRank) teleport: both become
    per-node vectors, zero off the seed set."""
    spos = np.searchsorted(hashes, _hash64(np.asarray(list(seeds), dtype=object)))
    tele_vec = np.zeros(n_nodes, dtype=np.int64)
    tele_vec[spos] = tele
    init = np.zeros(n_nodes, dtype=np.int64)
    init[spos] = r0
    return tele_vec, init


def _pagerank_broadcast(pages, node_ds, n_nodes, iters, tele, r0, driver_edges=_DRIVER_EDGES, seeds=None, out_col="rank_fp"):
    # bounded node table -> driver-held sorted uint64 url-hashes (the
    # strings never reach the driver); the materialized int-pair edge
    # table streams through one aggregation per round emitting per-dst
    # partials — zero shuffles per round.
    # seeds (TrustRank): teleport mass and the initial rank go ONLY to
    # the seed nodes — tele/r0 become per-node vectors, zero elsewhere.
    hashes = _sorted_node_hash_only(node_ds)
    if hashes is None:
        return None
    if seeds is None:
        tele_term: "np.ndarray | int" = tele
        init = np.full(n_nodes, r0, dtype=np.int64)
    else:
        tele_term, init = _seed_vectors(hashes, n_nodes, tele, r0, seeds)
    h_ref = ray.put(hashes)
    edge_ids = pages.map_batches(_edge_id_stage(hashes), batch_format="pyarrow").materialize()
    ranks = _pagerank_rounds(edge_ids, n_nodes, iters, tele_term, init, driver_edges)

    # distributed emit: ranks broadcast once, each url batch resolves
    # its own rows — output streams, no driver-built node table
    r_ref = ray.put(ranks)

    def emit(t: pa.Table, _h_ref=h_ref, _r_ref=r_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"url": pa.array([], pa.string()), out_col: pa.array([], pa.int64())})
        h = ray.get(_h_ref)
        r = ray.get(_r_ref)
        idx = np.searchsorted(h, _hash64(t.column("url").to_pandas()))
        return pa.table({"url": t.column("url"), out_col: pa.array(r[idx])})

    return node_ds.map_batches(emit, batch_format="pyarrow")


def _pagerank_join(node_ds, edges, iters, tele, r0, seeds=None, out_col="rank_fp"):
    """General path: one hash join + one Sum groupby per round.

    ``seeds`` (TrustRank): teleport and the initial rank apply only to
    the (bounded, closure-shipped) seed URL set instead of every node.

    Each round is materialized before the next starts (the canonical
    Pregel-style iteration checkpoint): a round's plan already carries
    three hash-shuffle joins, and chaining k rounds lazily would
    instantiate 3k aggregator actor pools at once — each join reserves
    ``num_partitions x 0.125`` CPUs for its aggregators, so the stacked
    pools deadlock on a small cluster and oversubscribe a large one.
    Materializing also pins the edge/rank tables so pages are read and
    links extracted exactly once, not once per round.
    """
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    # drop edges whose target has no page row (same dst-resolution mask
    # as the broadcast path — out-degree counts crawled targets only)
    edges = edges.join(
        node_ds.map_batches(
            lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
        ),
        join_type="left_semi",
        num_partitions=width,
        on=("dst",),
        right_on=("nd_url",),
    ).materialize()
    # degree table once
    deg = (
        edges.map_batches(
            lambda df: df.groupby("src", as_index=False).size().rename(columns={"size": "d"}),
            batch_format="pandas",
        )
        .groupby("src")
        .aggregate(Sum("d", alias_name="d"))
    ).materialize()
    seed_set = frozenset(seeds) if seeds is not None else None

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        if seed_set is None:
            r = np.full(len(df), r0, dtype=np.int64)
        else:
            r = df["url"].isin(seed_set).to_numpy(dtype=np.int64) * r0
        return pd.DataFrame({"url": df["url"], "r": r})

    ranks = node_ds.map_batches(init_ranks, batch_format="pandas")
    for _ in range(iters):
        contrib = ranks.join(deg, join_type="inner", num_partitions=width, on=("url",), right_on=("src",)).map_batches(
            lambda df: pd.DataFrame({"src": df["url"], "c": df["r"].to_numpy(np.int64) // df["d"].to_numpy(np.int64)}),
            batch_format="pandas",
        )
        incoming = (
            edges.join(contrib, join_type="inner", num_partitions=width, on=("src",), right_on=("src",))
            .map_batches(
                lambda df: df.groupby("dst", as_index=False)["c"].sum(),
                batch_format="pandas",
            )
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
        )
        def apply_tele(df: pd.DataFrame) -> pd.DataFrame:
            t = (
                tele
                if seed_set is None
                else df["url"].isin(seed_set).to_numpy(dtype=np.int64) * tele
            )
            return pd.DataFrame(
                {
                    "url": df["url"],
                    "r": t + (17 * df["s"].fillna(0).astype("int64").to_numpy(np.int64)) // 20,
                }
            )

        ranks = node_ds.join(incoming, join_type="left_outer", num_partitions=width, on=("url",), right_on=("dst",)).map_batches(
            apply_tele,
            batch_format="pandas",
        ).materialize()
    return ranks.map_batches(
        lambda df: df.rename(columns={"r": out_col}), batch_format="pandas"
    )


def hits_int(
    pages: rd.Dataset,
    iters: int = 2,
    base: int = HITS_BASE,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """k rounds of HITS hub/authority scoring (Kleinberg 1999) in exact
    int64 fixed point — bit-identical at any parallelism:

        h_0(u)  = base // N
        a'(v)   = sum over in-edges (u,v) of h(u)
        a(v)    = a'(v) // max(T // base, 1),  T = sum_v a'(v)
        h'(u)   = sum over out-edges (u,v) of a(v)
        h(u)    = h'(u) // max(S // base, 1),  S = sum_u h'(u)

    The L1 renormalization uses one integer scale divisor per
    half-step, so sums commute and the SQL oracle matches hash-exactly
    (the classic L2 normalization would need a float sqrt). External
    link targets are masked like ``pagerank_int`` (edges whose dst has
    no page row are dropped before any round).

    Broadcast path (<= broadcast_nodes): the per-half-step score
    column ships once via ``ray.put``; each edge batch probes it and
    emits bounded per-target partial sums — zero shuffle rounds.
    Beyond, each half-step is one edges ⨝ scores join + Sum groupby
    (the ``_pagerank_join`` shape); both paths are equality-tested.
    """
    n_nodes = pages.count()
    node_ds = pages.select_columns(["url"])
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "auth_fp": pa.array([], pa.int64()),
            "hub_fp": pa.array([], pa.int64()),
        }
    )
    if n_nodes == 0:
        return rd.from_arrow(empty)
    h0 = base // n_nodes

    if n_nodes <= broadcast_nodes:
        out = _hits_broadcast(pages, node_ds, n_nodes, iters, base, h0, driver_edges, empty)
        if out is not None:
            return out
    return _hits_join(node_ds, outlinks(pages), iters, base, h0)


def _hits_rescale(raw: np.ndarray, base: int) -> np.ndarray:
    total = int(raw.sum())
    if total == 0:
        return np.zeros_like(raw)
    return raw // max(total // base, 1)


def _hits_broadcast(pages, node_ds, n_nodes, iters, base, h0, driver_edges, empty):
    hashes = _sorted_node_hash_only(node_ds)
    if hashes is None:
        return None
    h_ref = ray.put(hashes)
    edge_ids = pages.map_batches(_edge_id_stage(hashes), batch_format="pyarrow").materialize()
    n_edges = edge_ids.count()

    hub = np.full(n_nodes, h0, dtype=np.int64)
    auth = np.zeros(n_nodes, dtype=np.int64)

    if n_edges <= driver_edges:
        idp = edge_ids.to_pandas()
        si = idp["si"].to_numpy(np.int64)
        di = idp["di"].to_numpy(np.int64)
        for _ in range(iters):
            raw = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(raw, di, hub[si])
            auth = _hits_rescale(raw, base)
            raw = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(raw, si, auth[di])
            hub = _hits_rescale(raw, base)
    else:

        def half_step(scores: np.ndarray, key: str, probe: str) -> np.ndarray:
            s_ref = ray.put(scores)

            def partial(t: pa.Table, _s_ref=s_ref) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table({"i": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
                sc = ray.get(_s_ref)  # zero-copy plasma view
                tgt = t.column(key).to_numpy(zero_copy_only=False)
                src = t.column(probe).to_numpy(zero_copy_only=False)
                df = pd.DataFrame({"i": tgt, "c": sc[src]})
                g = df.groupby("i", as_index=False)["c"].sum()
                return pa.table(
                    {"i": pa.array(g["i"].to_numpy(np.int64)), "s": pa.array(g["c"].to_numpy(np.int64))}
                )

            raw = np.zeros(n_nodes, dtype=np.int64)
            _merge_partials(
                edge_ids.map_batches(partial, batch_format="pyarrow"), "i", "s", raw
            )
            return raw

        for _ in range(iters):
            auth = _hits_rescale(half_step(hub, "di", "si"), base)
            hub = _hits_rescale(half_step(auth, "si", "di"), base)

    a_ref = ray.put(auth)
    b_ref = ray.put(hub)

    def emit(t: pa.Table, _h_ref=h_ref, _a_ref=a_ref, _b_ref=b_ref) -> pa.Table:
        if t.num_rows == 0:
            return empty
        h = ray.get(_h_ref)
        idx = np.searchsorted(h, _hash64(t.column("url").to_pandas()))
        return pa.table(
            {
                "url": t.column("url"),
                "auth_fp": pa.array(ray.get(_a_ref)[idx]),
                "hub_fp": pa.array(ray.get(_b_ref)[idx]),
            }
        )

    return node_ds.map_batches(emit, batch_format="pyarrow")


def _hits_join(node_ds, edges, iters, base, h0):
    """General path: two joins + two Sum groupbys per round, each
    half-step materialized (same Pregel-checkpoint reasoning as
    ``_pagerank_join``). The half-step L1 total is one tiny
    ``sum('s')`` aggregate — a scalar, not a shuffle."""
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    edges = edges.join(
        node_ds.map_batches(
            lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
        ),
        join_type="left_semi",
        num_partitions=width,
        on=("dst",),
        right_on=("nd_url",),
    ).materialize()

    def half_step(scores, on_col, emit_col):
        # scores: Dataset (url, v). join edges on on_col -> sum v per emit_col
        raw = (
            edges.join(scores, join_type="inner", num_partitions=width, on=(on_col,), right_on=("url",))
            .map_batches(
                lambda df, _e=emit_col: df.groupby(_e, as_index=False)["v"].sum(),
                batch_format="pandas",
            )
            .groupby(emit_col)
            .aggregate(Sum("v", alias_name="s"))
        ).materialize()
        total = int(raw.sum("s") or 0)
        scale = max(total // base, 1) if total else None
        out = node_ds.join(
            raw, join_type="left_outer", num_partitions=width, on=("url",), right_on=(emit_col,)
        ).map_batches(
            lambda df, _sc=scale: pd.DataFrame(
                {
                    "url": df["url"],
                    "v": (
                        df["s"].fillna(0).astype("int64").to_numpy(np.int64) // _sc
                        if _sc
                        else np.zeros(len(df), dtype=np.int64)
                    ),
                }
            ),
            batch_format="pandas",
        )
        return out.materialize()

    hub = node_ds.map_batches(
        lambda t: pa.table({"url": t.column("url"), "v": pa.array(np.full(t.num_rows, h0, dtype=np.int64))}),
        batch_format="pyarrow",
    ).materialize()
    auth = None
    for _ in range(iters):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")
    joined = auth.map_batches(
        lambda df: df.rename(columns={"v": "auth_fp"}), batch_format="pandas"
    ).join(
        hub.map_batches(lambda df: df.rename(columns={"url": "h_url", "v": "hub_fp"}), batch_format="pandas"),
        join_type="inner",
        num_partitions=width,
        on=("url",),
        right_on=("h_url",),
    )
    return joined.select_columns(["url", "auth_fp", "hub_fp"])


def discovered_urls(
    pages: rd.Dataset,
    broadcast_nodes: int = _BROADCAST_NODES,
) -> rd.Dataset:
    """Frontier expansion from discovered links: (url, n_refs) for every
    link target with NO page row — the next crawl wave's candidate set,
    the step the reference never takes (it crawls sitemap-listed URLs
    only, resources.go sitemap walk) but any open-web crawler needs.

    Scale shape: under the node bound the sorted node-hash array ships
    once and each batch masks members out vectorized (searchsorted),
    pre-combining (dst, count) partials before the dst-keyed groupby —
    the only exchange carries candidate URLs, not edges. Beyond the
    bound the same result is one left-anti hash join of the (already
    map-side-combined) target partials against the node table."""
    from ray.data.aggregate import Sum

    n_nodes = pages.count()
    node_ds = pages.select_columns(["url"])
    empty = pa.table({"url": pa.array([], pa.string()), "n_refs": pa.array([], pa.int64())})
    if n_nodes == 0:
        return rd.from_arrow(empty)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", as_index=False).size()
        return pd.DataFrame({"url": g["dst"], "n_refs": g["size"].astype("int64")})

    hashes = _sorted_node_hash_only(node_ds) if n_nodes <= broadcast_nodes else None
    if hashes is not None:
        h_ref = ray.put(hashes)

        def unknown(t: pa.Table, _h_ref=h_ref) -> pa.Table:
            if t.num_rows == 0:
                return empty
            h = ray.get(_h_ref)
            dst = np.asarray(t.column("dst").to_pandas(), dtype=object)
            dh = _hash64(dst)
            idx = np.searchsorted(h, dh)
            n = len(h)
            miss = (idx >= n) | (h[np.minimum(idx, n - 1)] != dh)
            if not miss.any():
                return empty
            g = pd.Series(dst[miss]).value_counts()
            return pa.table(
                {"url": pa.array(list(g.index), pa.string()), "n_refs": pa.array(g.to_numpy(np.int64))}
            )

        parts = outlinks(pages).map_batches(unknown, batch_format="pyarrow")
        return parts.groupby("url").aggregate(Sum("n_refs", alias_name="n_refs"))

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    parts = outlinks(pages).map_batches(partials, batch_format="pandas")
    unknown = parts.join(
        node_ds.map_batches(lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"),
        join_type="left_anti",
        num_partitions=width,
        on=("url",),
        right_on=("nd_url",),
    )
    return unknown.groupby("url").aggregate(Sum("n_refs", alias_name="n_refs"))


def rank_priority(
    pages: rd.Dataset,
    iters: int = 2,
    base: int = PAGERANK_BASE,
) -> rd.Dataset:
    """Close the scheduling loop: PageRank -> frontier priority tier.

    The uniform-mass rank is ``base // N``; a page is 'hot' at >= 2x
    uniform, 'warm' at >= 1x, else 'cold' (integer thresholds, so the
    tiering is exact and engine/SQL identical). Analogous to
    ``pipelines/recrawl.priority_update`` which closes the same loop
    from measured *change rates* — this one closes it from link
    structure, the classic crawl-ordering signal. Output:
    (url, rank_fp, priority)."""
    n_nodes = pages.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "rank_fp": pa.array([], pa.int64()), "priority": pa.array([], pa.string())})
        )
    t = base // n_nodes
    ranks = pagerank_int(pages, iters=iters, base=base)

    def tier(tbl: pa.Table) -> pa.Table:
        r = tbl.column("rank_fp").to_numpy(zero_copy_only=False)
        pr = np.where(r >= 2 * t, "hot", np.where(r >= t, "warm", "cold"))
        return tbl.append_column("priority", pa.array(pr.astype(object), pa.string()))

    return ranks.map_batches(tier, batch_format="pyarrow")


def components_min_label(
    pages: rd.Dataset,
    iters: int = 4,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """k rounds of undirected min-label propagation; the label is the
    smallest URL string seen, so the result is exact and
    order-independent. After convergence the label is the component's
    lexicographic min URL; with fixed k both engine and SQL oracle
    compute the identical k-hop contraction."""
    n_nodes = pages.count()
    node_ds = pages.select_columns(["url"])
    if n_nodes == 0:
        return rd.from_arrow(pa.table({"url": pa.array([], pa.string()), "component": pa.array([], pa.string())}))
    if n_nodes <= broadcast_nodes:
        out = _components_broadcast(pages, node_ds, n_nodes, iters, driver_edges)
        if out is not None:
            return out
    return _components_join(node_ds, outlinks(pages), iters)


def _components_broadcast(pages, node_ds, n_nodes, iters, driver_edges=_DRIVER_EDGES):
    nodes = _sorted_node_hashes(node_ds, n_nodes)
    if nodes is None:
        return None
    hashes, urls = nodes
    # undirected edge list as int id pairs: one fused streaming pass,
    # pulled only under the edge-count gate (see _edge_ids_driver)
    ids = _edge_ids_driver(pages, hashes, driver_edges)
    if ids is None:
        return None
    a, b = ids
    # hashes are sorted, urls aligned to hash order — NOT string order,
    # so the label must be the min *url string*, resolved via a string
    # sort (index -> string rank) once. URLs are distinct, so Arrow's
    # C sort replaces a per-compare Python argsort over object strings.
    urls_arrow = pa.array(urls, pa.string())
    rank_to_idx = pc.array_sort_indices(urls_arrow).to_numpy().astype(np.int64)
    str_rank = np.empty(n_nodes, dtype=np.int64)
    str_rank[rank_to_idx] = np.arange(n_nodes, dtype=np.int64)
    lbl = str_rank.copy()  # label = string rank of the node itself
    for _ in range(iters):
        nxt = lbl.copy()
        np.minimum.at(nxt, b, lbl[a])
        np.minimum.at(nxt, a, lbl[b])
        lbl = np.minimum(lbl, nxt)
    comp = pc.take(urls_arrow, pa.array(rank_to_idx[lbl]))
    return rd.from_arrow(pa.table({"url": urls_arrow, "component": comp}))


def _components_join(node_ds, edges, iters):
    # per-round materialization: same aggregator-pool-stacking rationale
    # as _pagerank_join (see its docstring)
    from ray.data.aggregate import Min

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    # same dst-resolution mask as the broadcast path (see _pagerank_join)
    edges = edges.join(
        node_ds.map_batches(
            lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
        ),
        join_type="left_semi",
        num_partitions=width,
        on=("dst",),
        right_on=("nd_url",),
    )
    und = edges.union(
        edges.map_batches(
            lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}), batch_format="pyarrow"
        )
    ).materialize()
    labels = node_ds.map_batches(
        lambda t: pa.table({"url": t.column("url"), "lbl": t.column("url")}), batch_format="pyarrow"
    )
    def _prop(df: pd.DataFrame) -> pa.Table:
        # arrow out: the union with `labels` (arrow blocks) must not mix
        # block types in one dataset
        g = df.groupby("dst", as_index=False)["lbl"].min().rename(columns={"dst": "url"})
        return pa.table({"url": pa.array(g["url"], pa.string()), "lbl": pa.array(g["lbl"], pa.string())})

    for _ in range(iters):
        prop = und.join(labels, join_type="inner", num_partitions=width, on=("src",), right_on=("url",)).map_batches(
            _prop,
            batch_format="pandas",
        )
        labels = (
            labels.union(prop)
            .groupby("url")
            .aggregate(Min("lbl", alias_name="lbl"))
        ).materialize()
    return labels.map_batches(lambda df: df.rename(columns={"lbl": "component"}), batch_format="pandas")


def indegree_topk(pages: rd.Dataset, k: int = 25) -> rd.Dataset:
    """The k most-linked URLs — the hub report every crawl operator
    reads first (and the seed list a recrawl prioritizes). Ties break
    to the smaller URL string so the result is exact and engine/SQL
    identical. Output: ``(url, in_degree)``, k rows.

    Scale shape: rides :func:`indegree`'s pre-combined reduce, then a
    per-batch local top-k partial and ONE bounded driver merge of
    k rows per block — no global sort."""
    ind = indegree(pages)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        # top-k by (-in_degree, url): select_k on two sort keys
        idx = pc.select_k_unstable(
            t, k=min(k, t.num_rows), sort_keys=[("in_degree", "descending"), ("url", "ascending")]
        )
        return t.take(idx)

    parts = ind.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(
        ["in_degree", "url"], ascending=[False, True], kind="stable", ignore_index=True
    ).head(k)
    return rd.from_pandas(out.astype({"in_degree": "int64"}))


def depth_histogram(
    pages: rd.Dataset,
    n_seeds: int = 10,
    iters: int = 4,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """Crawl-reachability histogram: how many URLs sit at each hop
    depth from the seed list (the coverage curve a depth-limited crawl
    budget is planned against). Output: ``(depth, n_urls)``, one row
    per reached depth in [0, iters] — tiny (<= iters+1 rows)."""
    from ray.data.aggregate import Sum

    sd = seed_depth(
        pages, n_seeds=n_seeds, iters=iters, broadcast_nodes=broadcast_nodes, driver_edges=driver_edges
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("depth", as_index=False).agg(n=("depth", "size"))
        return g.astype({"depth": "int64", "n": "int64"})

    return (
        sd.map_batches(partial, batch_format="pandas")
        .groupby("depth")
        .aggregate(Sum("n", alias_name="n_urls"))
    )


def component_sizes(
    pages: rd.Dataset,
    iters: int = 4,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """Component size distribution — the classic web-graph macro report
    (mirror clusters and link farms surface as outsized components;
    Broder et al. 2000's bow-tie analysis starts here). Output:
    ``(component, n_urls)``, one row per component of
    :func:`components_min_label`'s k-hop contraction.

    Scale shape: per-batch partial counts pre-combine before the
    component-keyed Sum groupby, so the exchange carries one row per
    (component, batch). Component labels approach node cardinality on
    a sparse graph — past ~10^8 distinct labels, bucket the exchange
    by a label-hash byte first (the web_training_prep device,
    documented seam)."""
    from ray.data.aggregate import Sum

    comp = components_min_label(pages, iters=iters, broadcast_nodes=broadcast_nodes, driver_edges=driver_edges)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("component", as_index=False).agg(n=("component", "size"))
        return g.astype({"n": "int64"})

    return (
        comp.map_batches(partial, batch_format="pandas")
        .groupby("component")
        .aggregate(Sum("n", alias_name="n_urls"))
    )


def seed_depth(
    pages: rd.Dataset,
    n_seeds: int = 10,
    iters: int = 4,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """BFS crawl depth from the ``n_seeds`` lexicographically-smallest
    URLs along DIRECTED outlinks — the depth-limited-crawl scheduling
    signal (how many hops from the seed list each page sits). With
    fixed ``iters`` rounds both the engine and the SQL oracle compute
    the identical k-hop relaxation: round r holds min-depth over paths
    of length <= r; only reached nodes are emitted (depth in
    [0, iters], exact small ints).

    Scale shape mirrors ``components_min_label``: below
    ``broadcast_nodes`` the node set broadcasts once and each round is
    a vectorized ``np.minimum.at`` over the int edge ids (round inputs
    come from the PREVIOUS round's array copy, so within-round
    chaining cannot diverge from the oracle); above it the same round
    runs as edges ⨝ depths join + Min groupby."""
    n_nodes = pages.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "depth": pa.array([], pa.int64())})
        )
    node_ds = pages.select_columns(["url"])
    if n_nodes <= broadcast_nodes:
        out = _seed_depth_broadcast(pages, node_ds, n_nodes, n_seeds, iters, driver_edges)
        if out is not None:
            return out
    return _seed_depth_join(node_ds, outlinks(pages), n_seeds, iters)


def _seed_depth_broadcast(pages, node_ds, n_nodes, n_seeds, iters, driver_edges=_DRIVER_EDGES):
    nodes = _sorted_node_hashes(node_ds, n_nodes)
    if nodes is None:
        return None
    hashes, urls = nodes
    ids = _edge_ids_driver(pages, hashes, driver_edges)
    if ids is None:
        return None
    a, b = ids
    big = np.int64(iters + 1)  # sentinel: strictly beyond any reachable depth
    depth = np.full(n_nodes, big, dtype=np.int64)
    # k smallest url strings via Arrow's C partial sort (urls are
    # distinct, so stability is moot; the old np.argsort paid a Python
    # compare per probe over the whole node set)
    seed_idx = (
        pc.select_k_unstable(
            pa.array(urls, pa.string()), k=min(n_seeds, n_nodes), sort_keys=[("", "ascending")]
        )
        .to_numpy()
        .astype(np.int64)
    )
    depth[seed_idx] = 0
    for _ in range(iters):
        nxt = depth.copy()
        if len(a):
            np.minimum.at(nxt, b, depth[a] + 1)
        depth = nxt
    mask = depth <= iters
    # arrow filter over the node strings (no Python list round-trip)
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()).filter(pa.array(mask)),
                "depth": pa.array(depth[mask], pa.int64()),
            }
        )
    )


def _min_k_urls(node_ds, k: int) -> list:
    """Global k smallest url strings: per-batch local min-k partials,
    driver merge — no global sort."""
    def local(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.array_sort_indices(t.column("url").combine_chunks())[:k]
        return pa.table({"url": t.column("url").take(idx)})

    parts = node_ds.map_batches(local, batch_format="pyarrow").to_pandas()
    return sorted(parts["url"])[:k]


def _seed_depth_join(node_ds, edges, n_seeds, iters):
    from ray.data.aggregate import Min

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    edges = edges.join(
        node_ds.map_batches(
            lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
        ),
        join_type="left_semi",
        num_partitions=width,
        on=("dst",),
        right_on=("nd_url",),
    ).materialize()
    seeds = _min_k_urls(node_ds, n_seeds)
    depths = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(seeds, pa.string()),
                "depth": pa.array(np.zeros(len(seeds), dtype=np.int64), pa.int64()),
            }
        )
    )

    def _prop(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("dst", as_index=False)["depth"].min()
        return pa.table(
            {
                "url": pa.array(g["dst"], pa.string()),
                "depth": pa.array(g["depth"].to_numpy(np.int64) + 1, pa.int64()),
            }
        )

    for _ in range(iters):
        prop = edges.join(
            depths, join_type="inner", num_partitions=width, on=("src",), right_on=("url",)
        ).map_batches(_prop, batch_format="pandas")
        depths = (
            depths.union(prop).groupby("url").aggregate(Min("depth", alias_name="depth"))
        ).materialize()
    return depths


# undirected distinct host-edge tables at or below this row count fold
# to the driver (16 B/edge packed -> <=800 MB) where wedge closure is
# one vectorized merge + searchsorted probe; above it the same closure
# runs as two Dataset.joins at cluster width (the documented seam)
_DRIVER_TRI_EDGES = 50_000_000


def host_triangles(pages: rd.Dataset, driver_edges: int = _DRIVER_TRI_EDGES) -> pd.DataFrame:
    """Per-host triangle participation over the undirected distinct
    host graph — the classic link-spam / mirror-cluster density signal
    (spam farms and mirror rings are triangle-dense; legitimate
    topical hubs are star-shaped and triangle-sparse).  The reference
    never looks across hosts (summoner treats each source in
    isolation); a 10^10-URL frontier planner needs exactly this
    cross-host structure to down-weight cliques.

    Definition: project the page link multigraph to hosts
    (``host_edges``), drop self-loops, canonicalize each edge to the
    unordered distinct pair (a, b) with a < b.  Every triangle
    x < y < z counts once and contributes 1 to each member host.
    Output: one row per host present in the undirected edge set,
    ``(host, n_triangles)``, host-sorted.

    Scale shape: ``host_edges`` has already combined the O(edges)
    anchor stream down to O(hosts^2)-bounded weighted rows, so the
    canonicalize + distinct here exchanges only narrow (a, b) keys.
    Under ``driver_edges`` the distinct pair table folds to the driver:
    wedge enumeration is ONE vectorized self-merge on the middle
    vertex and closure is a searchsorted membership probe over packed
    uint64 edge keys — no Python loop over edges or wedges.  Above the
    cap, the same plan runs distributed (self-join on b == a at
    cluster width, then a left_semi closure join on (a, c)); both
    paths share the counting kernel and are pinned equal by
    ``tests/test_linkgraph.py``.
    """
    und = _undirected_host_pairs(pages)
    total = und.count()
    if total <= driver_edges:
        df = und.to_pandas()
        return _triangles_driver(df)
    return _triangles_join(und)


def _undirected_host_pairs(pages: rd.Dataset) -> rd.Dataset:
    """Distinct undirected host pairs (a < b) from the host multigraph."""
    edges = host_edges(pages)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str)})
        s = df["src_host"].astype(str)
        d = df["dst_host"].astype(str)
        keep = s != d  # self-loops close no triangle
        s, d = s[keep], d[keep]
        a = s.where(s < d, d)
        b = d.where(s < d, s)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates(ignore_index=True)

    from ray.data.aggregate import Count

    pairs = edges.map_batches(canon, batch_format="pandas")
    # key-only distinct: the exchange carries (a, b) pairs, no payload
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n")).select_columns(["a", "b"])


def _pack_keys(ai: np.ndarray, bi: np.ndarray, n: int) -> np.ndarray:
    return ai.astype(np.uint64) * np.uint64(n) + bi.astype(np.uint64)


def _triangles_driver(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized wedge-closure triangle count on the bounded pair table."""
    hosts = np.unique(np.concatenate([df["a"].to_numpy(dtype=object), df["b"].to_numpy(dtype=object)])) if len(df) else np.array([], dtype=object)
    n = len(hosts)
    out_zero = pd.DataFrame({"host": pd.Series(hosts, dtype=object), "n_triangles": np.zeros(n, dtype=np.int64)})
    if n < 3 or len(df) < 3:
        return out_zero
    idx = pd.Index(hosts)
    ai = idx.get_indexer(df["a"]).astype(np.int64)
    bi = idx.get_indexer(df["b"]).astype(np.int64)
    keys = np.sort(_pack_keys(ai, bi, n))
    e = pd.DataFrame({"ai": ai, "bi": bi})
    # wedge (x < y < z): edge (x, y) chained with edge (y, z)
    w = e.merge(e.rename(columns={"ai": "bi", "bi": "ci"}), on="bi")
    probe = _pack_keys(w["ai"].to_numpy(np.int64), w["ci"].to_numpy(np.int64), n)
    pos = np.searchsorted(keys, probe)
    pos[pos >= len(keys)] = len(keys) - 1
    closed = keys[pos] == probe
    tri = w[closed]
    counts = np.zeros(n, dtype=np.int64)
    members = np.concatenate([tri["ai"].to_numpy(np.int64), tri["bi"].to_numpy(np.int64), tri["ci"].to_numpy(np.int64)])
    np.add.at(counts, members, 1)
    return pd.DataFrame({"host": pd.Series(hosts, dtype=object), "n_triangles": counts})


def _triangles_join(und: rd.Dataset) -> pd.DataFrame:
    """Distributed wedge closure: self-join on the middle vertex, then a
    left_semi membership join on the closing (a, c) pair."""
    from gleaner_ray.cluster import cluster_cpus
    from ray.data.aggregate import Sum

    width = max(8, cluster_cpus(8))

    def _as_wedge_left(t: pa.Table) -> pa.Table:
        return pa.table({"wa": t.column("a"), "wb": t.column("b")})

    def _as_wedge_right(t: pa.Table) -> pa.Table:
        return pa.table({"rb": t.column("a"), "rc": t.column("b")})

    left = und.map_batches(_as_wedge_left, batch_format="pyarrow")
    right = und.map_batches(_as_wedge_right, batch_format="pyarrow")
    wedges = left.join(
        right, join_type="inner", num_partitions=width, on=("wb",), right_on=("rb",)
    )
    closed = wedges.join(
        und,
        join_type="left_semi",
        num_partitions=width,
        on=("wa", "rc"),
        right_on=("a", "b"),
    )

    def members(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"host": pd.Series(dtype=str), "n_triangles": pd.Series(dtype="int64")})
        hosts = pa.concat_arrays(
            [t.column("wa").combine_chunks(), t.column("wb").combine_chunks(), t.column("rc").combine_chunks()]
        ).to_pandas()
        g = hosts.value_counts()
        return pd.DataFrame({"host": g.index.astype(object), "n_triangles": g.to_numpy(np.int64)})

    from .fold import fold_or_reduce

    parts = closed.map_batches(members, batch_format="pyarrow")
    folded, mat = fold_or_reduce(parts, ["host"], {"n_triangles": "sum"})
    if folded is None:
        folded = mat.groupby("host").aggregate(Sum("n_triangles", alias_name="n_triangles")).to_pandas()
    # hosts whose edges close no triangle still appear, with 0
    all_hosts = pd.Series(
        np.unique(np.concatenate([np.asarray(und.unique("a"), dtype=object), np.asarray(und.unique("b"), dtype=object)])),
        dtype=object,
    )
    out = pd.DataFrame({"host": all_hosts}).merge(folded, on="host", how="left")
    out["n_triangles"] = out["n_triangles"].fillna(0).astype(np.int64)
    return out.sort_values("host", ignore_index=True)


def host_budget(pages: rd.Dataset, total_budget: int = 1_000_000, iters: int = 2) -> pd.DataFrame:
    """Per-host crawl-budget apportionment: divide a global fetch
    budget over hosts proportionally to their ``host_rank`` mass using
    the largest-remainder method (exact integer arithmetic, so the
    allocation is order-independent and sums to the budget exactly).
    This is the planning step between link analysis and the politeness
    scheduler: ST3's per-host queues consume these quotas
    (acquire.go:71-73 enforces pace; this op decides volume).

    base_i  = (B * rank_i) // total_rank
    leftover = B - sum(base) extra units go to the hosts with the
    largest remainders ``(B * rank_i) % total_rank``, host-ascending on
    ties — the classic Hamilton apportionment, bit-exact in SQL.

    Scale shape: runs on ``host_rank``'s bounded host table (driver
    vector math over <=10^8 rows; the same documented seam as
    host_rank itself) — zero additional cluster passes.
    """
    hr = host_rank(pages, iters=iters)
    n = len(hr)
    if n == 0 or total_budget <= 0:
        return pd.DataFrame({"host": pd.Series(dtype=object), "budget": pd.Series(dtype="int64")})
    hr = hr.sort_values("host", ignore_index=True)
    rank = hr["rank_fp"].to_numpy(np.int64)
    total = int(rank.sum())
    if total <= 0:
        base = np.zeros(n, dtype=np.int64)
        rem = np.zeros(n, dtype=np.int64)
    else:
        prod = rank.astype(object) * int(total_budget)  # exact big-int, no overflow
        base = np.array([int(p) // total for p in prod], dtype=np.int64)
        rem = np.array([int(p) % total for p in prod], dtype=np.int64)
    leftover = int(total_budget) - int(base.sum())
    # largest remainder first, host-ascending tiebreak: hosts are already
    # host-sorted, so a stable argsort on -rem gives exactly that order
    order = np.argsort(-rem, kind="stable")
    bonus = np.zeros(n, dtype=np.int64)
    bonus[order[:leftover]] = 1
    return pd.DataFrame({"host": hr["host"], "budget": base + bonus})


def degree_distribution(pages: rd.Dataset) -> rd.Dataset:
    """(side, degree, n_urls) — the in- and out-degree histograms of
    the page graph, the standard power-law diagnostic for a web crawl
    (a healthy crawl shows a heavy in-degree tail; a flat one signals a
    spider trap or template farm).

    Scale shape: both sides reduce to bounded (degree, count) tables —
    degree domains are capped by links-per-page (out) and the corpus's
    hottest target (in), thousands of distinct values at most. Out-side
    partials are row-local over :func:`outlink_degree` (zero-degree
    pages included, unlike a bare GROUP BY src); in-side rides
    :func:`indegree`'s distinct-target reduce (zero-inlink URLs absent,
    matching SQL). One dual-path fold merges the partials."""
    from ray.data.aggregate import Sum

    from .fold import DRIVER_KEYS, fold_or_reduce

    empty = pd.DataFrame(
        {
            "side": pd.Series(dtype=object),
            "degree": pd.Series(dtype="int64"),
            "n_urls": pd.Series(dtype="int64"),
        }
    )

    def hist(col: str, side: str):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return empty
            g = df.groupby(col, as_index=False).size()
            return pd.DataFrame(
                {
                    "side": side,
                    "degree": g[col].astype("int64"),
                    "n_urls": g["size"].astype("int64"),
                }
            )

        return partial

    outd = outlink_degree(pages).map_batches(hist("out_degree", "out"), batch_format="pandas")
    ind = indegree(pages).map_batches(hist("in_degree", "in"), batch_format="pandas")
    folded, parts = fold_or_reduce(
        outd.union(ind), ["side", "degree"], {"n_urls": "sum"}, DRIVER_KEYS
    )
    if folded is not None:
        if folded.empty:
            return rd.from_pandas(empty)
        return rd.from_pandas(folded.astype({"degree": "int64", "n_urls": "int64"}))
    return parts.groupby(["side", "degree"]).aggregate(Sum("n_urls", alias_name="n_urls"))


def kcore(
    pages: rd.Dataset,
    k: int = 2,
    rounds: int = 4,
    broadcast_nodes: int = _BROADCAST_NODES,
    force_join: bool = False,
    driver_edges: int = _DRIVER_EDGES,
) -> rd.Dataset:
    """Fixed-round k-core peeling over the undirected page graph — the
    density filter that separates a genuinely interlinked cluster from
    chains and stars (link-farm cores survive, long redirect/template
    chains peel away; Seidman 1983, "Network structure and minimum
    degree"). Each round removes every node whose degree in the
    SURVIVING subgraph is < ``k``; with ``rounds`` fixed both engines
    compute the identical contraction even before convergence (extra
    rounds past convergence are no-ops, so fixed-round = exact k-core
    once stable).

    Output: ``(url, core_deg)`` for nodes with >= 1 edge in the
    surviving subgraph; ``core_deg`` is the degree there.

    Scale shape: under the node bound the edge list reduces to packed
    uint64 id pairs (``np.unique`` dedupe) and every peel round is two
    ``bincount`` passes — zero shuffles after the one edge-extract
    pass. Beyond the bound the same rounds run distributed: two
    semi-joins restrict the (distinct, undirected) edge table to the
    surviving nodes and one bounded groupby-Sum recomputes degrees per
    round. Both paths equality-tested (``force_join``)."""
    n_nodes = pages.count()
    node_ds = pages.select_columns(["url"])
    empty = pa.table({"url": pa.array([], pa.string()), "core_deg": pa.array([], pa.int64())})
    if n_nodes == 0:
        return rd.from_arrow(empty)
    if not force_join and n_nodes <= broadcast_nodes:
        nodes = _sorted_node_hashes(node_ds, n_nodes)
        ids = _edge_ids_driver(pages, nodes[0], driver_edges) if nodes is not None else None
        if ids is not None:
            _, urls = nodes
            a, b = ids
            m = a != b
            lo = np.minimum(a[m], b[m]).astype(np.uint64)
            hi = np.maximum(a[m], b[m]).astype(np.uint64)
            packed = np.unique((lo << np.uint64(32)) | hi)
            u = (packed >> np.uint64(32)).astype(np.int64)
            v = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
            alive = np.ones(n_nodes, dtype=bool)
            for _ in range(rounds):
                em = alive[u] & alive[v]
                deg = np.bincount(u[em], minlength=n_nodes) + np.bincount(v[em], minlength=n_nodes)
                alive &= deg >= k
            em = alive[u] & alive[v]
            deg = np.bincount(u[em], minlength=n_nodes) + np.bincount(v[em], minlength=n_nodes)
            sel = deg > 0
            return rd.from_pandas(
                pd.DataFrame({"url": urls[sel], "core_deg": deg[sel].astype("int64")})
            )
    return _kcore_join(node_ds, outlinks(pages), k, rounds)


def _kcore_join(node_ds, edges, k: int, rounds: int) -> rd.Dataset:
    """Distributed peeling: per round, two left-semi joins restrict the
    distinct undirected edge table to surviving nodes and one groupby
    recomputes degrees (materialized per round — same aggregator-pool
    rationale as ``_pagerank_join``)."""
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    edges = edges.join(
        node_ds.map_batches(
            lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
        ),
        join_type="left_semi",
        num_partitions=width,
        on=("dst",),
        right_on=("nd_url",),
    )

    def undir(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df[df["src"] != df["dst"]]
        if df.empty:
            return pd.DataFrame({"u": pd.Series(dtype=str), "v": pd.Series(dtype=str)})
        u = np.minimum(df["src"], df["dst"])
        v = np.maximum(df["src"], df["dst"])
        return pd.DataFrame({"u": u, "v": v}).drop_duplicates(ignore_index=True)

    from ray.data.aggregate import Count

    und = (
        edges.map_batches(undir, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["u", "v"])
        .materialize()
    )

    def degrees(edge_ds):
        def partial(t: pa.Table) -> pd.DataFrame:
            df = t.to_pandas()
            s = pd.concat([df["u"], df["v"]], ignore_index=True)
            g = s.value_counts()
            return pd.DataFrame({"url": g.index, "n": g.to_numpy().astype("int64")})

        return (
            edge_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("url")
            .aggregate(Sum("n", alias_name="core_deg"))
        )

    cur = und
    for _ in range(rounds):
        alive = (
            degrees(cur)
            .map_batches(
                lambda df, _k=k: df[df["core_deg"] >= _k][["url"]], batch_format="pandas"
            )
            .materialize()
        )
        for col, alias in (("u", "au"), ("v", "av")):
            cur = cur.join(
                alive.map_batches(
                    lambda t, _a=alias: pa.table({_a: t.column("url")}), batch_format="pyarrow"
                ),
                join_type="left_semi",
                num_partitions=width,
                on=(col,),
                right_on=(alias,),
            )
        cur = cur.materialize()
    return degrees(cur)


def host_jaccard(pages: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Outlink-set similarity between host pairs: J = |A∩B| / |A∪B|
    where A is host a's distinct set of link targets — the structural
    mirror signal (``recrawl.mirror_hosts`` is the content twin keyed
    on body digests; this one catches mirrors that rewrite bodies but
    keep navigation, and template-sharing site families).

    Scale shape: a streaming pass extracts links and pre-dedupes
    (host, dst) within each batch; a dual-path distinct makes it
    global (driver fold under the ``ops.fold`` cap, groupby beyond);
    the dst-keyed self-join emits only co-citations, combined map-side
    to bounded (host_a, host_b) partials before the host-pair-sized
    Sum. One double division per surviving pair, in the oracle's
    operand order i / (na + nb - i)."""
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus
    from .fold import fold_or_reduce

    if num_partitions is None:
        num_partitions = max(2, cluster_cpus(8))

    links = outlinks(pages)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "host": pd.Series(dtype=object),
                    "dst": pd.Series(dtype=object),
                    "_n": pd.Series(dtype="int8"),
                }
            )
        out = pd.DataFrame({"host": _host_of(df["src"]), "dst": df["dst"]}).drop_duplicates()
        return out.assign(_n=np.ones(len(out), dtype=np.int8))

    parts = links.map_batches(partial, batch_format="pandas")
    folded, parts = fold_or_reduce(parts, ["host", "dst"], {"_n": "max"})

    def finish(hl: pd.DataFrame) -> pd.DataFrame:
        sz = hl.groupby("host").size()
        m = hl.merge(hl, on="dst")
        m = m[m["host_x"] < m["host_y"]]
        g = m.groupby(["host_x", "host_y"], as_index=False).agg(n_inter=("dst", "size"))
        na = sz.reindex(g["host_x"]).to_numpy()
        nb = sz.reindex(g["host_y"]).to_numpy()
        inter = g["n_inter"].to_numpy(dtype=np.int64)
        union = na + nb - inter
        return pd.DataFrame(
            {
                "host_a": g["host_x"],
                "host_b": g["host_y"],
                "n_inter": inter,
                "n_union": union.astype(np.int64),
                "jaccard": inter.astype(np.float64) / union,
            }
        )

    if folded is not None:
        return rd.from_pandas(finish(folded[["host", "dst"]]))

    # beyond the fold cap: global distinct via groupby, dst-keyed
    # self-join, map-side pair combine, host-pair-sized Sum
    hl = parts.groupby(["host", "dst"]).aggregate(Sum("_n", alias_name="_n")).drop_columns(["_n"])
    sizes = (
        hl.map_batches(
            lambda df: df.groupby("host", as_index=False).agg(n=("dst", "size")),
            batch_format="pandas",
        )
        .groupby("host")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    sz_ref = ray.put(dict(zip(sizes["host"], sizes["n"].astype(np.int64))))
    joined = hl.join(
        hl.map_batches(
            lambda t: pa.table({"host_b": t.column("host"), "dst_b": t.column("dst")}),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("dst_b",),
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["host"] < df["host_b"]]
        if df.empty:
            return pd.DataFrame(
                {
                    "host_a": pd.Series(dtype=object),
                    "host_b": pd.Series(dtype=object),
                    "n_inter": pd.Series(dtype="int64"),
                }
            )
        g = df.groupby(["host", "host_b"], as_index=False).agg(n_inter=("host", "size"))
        return g.rename(columns={"host": "host_a"}).astype({"n_inter": "int64"})

    pairs = (
        joined.map_batches(pair_partial, batch_format="pandas")
        .groupby(["host_a", "host_b"])
        .aggregate(Sum("n_inter", alias_name="n_inter"))
    )

    def emit(df: pd.DataFrame, _sz=sz_ref) -> pd.DataFrame:
        sz = ray.get(_sz)
        na = df["host_a"].map(sz).to_numpy(dtype=np.int64)
        nb = df["host_b"].map(sz).to_numpy(dtype=np.int64)
        inter = df["n_inter"].to_numpy(dtype=np.int64)
        union = na + nb - inter
        return pd.DataFrame(
            {
                "host_a": df["host_a"],
                "host_b": df["host_b"],
                "n_inter": inter,
                "n_union": union,
                "jaccard": inter.astype(np.float64) / union,
            }
        )

    return pairs.map_batches(emit, batch_format="pandas")


def label_prop(
    pages: rd.Dataset,
    iters: int = 2,
    broadcast_nodes: int = _BROADCAST_NODES,
    driver_edges: int = _DRIVER_EDGES,
    fold_cap: int | None = None,
) -> rd.Dataset:
    """Synchronous label propagation (Raghavan et al. 2007) with a
    deterministic tie-break — community detection for link-farm /
    site-family discovery, the mode-vote sibling of
    :func:`components_min_label` (components merge on ANY path; LPA
    needs a neighborhood MAJORITY, so weakly-bridged clusters stay
    separate).

    Each round every node adopts the most frequent label among its
    undirected neighbors (multiplicity counted, self-loops dropped),
    ties to the lexicographically smallest label; nodes with no
    neighbors keep their own. Fixed ``iters`` rounds so engine and SQL
    oracle compute the identical contraction.

    Scale shape mirrors the PageRank dual path: under the node bound
    the edge id list folds once and every round is one vectorized
    np.unique + lexsort argmax on the driver (zero shuffles/round);
    beyond, each round is edges ⨝ labels + (dst, lbl) Sum groupby +
    per-dst argmax map_groups, materialized per iteration. Both paths
    are equality-tested."""
    n_nodes = pages.count()
    node_ds = pages.select_columns(["url"])
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table({"url": pa.array([], pa.string()), "community": pa.array([], pa.string())})
        )
    if n_nodes <= broadcast_nodes:
        out = _label_prop_broadcast(pages, node_ds, n_nodes, iters, driver_edges)
        if out is not None:
            return out
    return _label_prop_join(node_ds, outlinks(pages), iters, fold_cap=fold_cap)


def _label_prop_broadcast(pages, node_ds, n_nodes, iters, driver_edges=_DRIVER_EDGES):
    nodes = _sorted_node_hashes(node_ds, n_nodes)
    if nodes is None:
        return None
    hashes, urls = nodes
    ids = _edge_ids_driver(pages, hashes, driver_edges)
    if ids is None:
        return None
    a, b = ids
    keep = a != b  # self-loops do not vote
    a, b = a[keep], b[keep]
    # labels live in string-rank space so "min label" = min rank (same
    # device as _components_broadcast: hash order is not string order).
    # URLs are distinct, so the rank is tie-free: Arrow's C string sort
    # replaces a per-compare Python np.argsort over object strings.
    urls_arrow = pa.array(urls, pa.string())
    rank_to_idx = pc.array_sort_indices(urls_arrow).to_numpy().astype(np.int64)
    str_rank = np.empty(n_nodes, dtype=np.int64)
    str_rank[rank_to_idx] = np.arange(n_nodes, dtype=np.int64)
    lbl = str_rank.copy()
    tgt = np.concatenate([b, a])
    src = np.concatenate([a, b])
    for _ in range(iters):
        votes = lbl[src]
        key = tgt * np.int64(n_nodes) + votes
        uk, cnt = np.unique(key, return_counts=True)
        if not len(uk):
            break  # no edges -> labels already fixed
        v_node = uk // n_nodes
        v_lab = uk % n_nodes
        # per node: max count, tie -> min label rank. np.unique already
        # sorted by (node, label-rank); the winner is the FIRST entry
        # hitting the per-node max — an O(n) reduceat segment-argmax,
        # ~2x faster than the previous (node, -count, rank) lexsort.
        seg_start = np.flatnonzero(np.r_[True, v_node[1:] != v_node[:-1]])
        seg_max = np.maximum.reduceat(cnt, seg_start)
        seg_len = np.diff(np.r_[seg_start, len(cnt)])
        is_max = cnt == np.repeat(seg_max, seg_len)
        mi = np.flatnonzero(is_max)
        sid = np.searchsorted(seg_start, mi, side="right") - 1
        first = np.r_[True, sid[1:] != sid[:-1]]
        win = mi[first]
        nxt = lbl.copy()
        nxt[v_node[win]] = v_lab[win]
        lbl = nxt
    comm = pc.take(urls_arrow, pa.array(rank_to_idx[lbl]))
    return rd.from_arrow(pa.table({"url": urls_arrow, "community": comm}))


def _label_prop_join(node_ds, edges, iters, fold_cap=None):
    # per-round materialization: same aggregator-pool-stacking
    # rationale as _pagerank_join
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus
    from .fold import DRIVER_KEYS, fold_or_reduce

    if fold_cap is None:
        fold_cap = DRIVER_KEYS
    width = max(2, cluster_cpus(8))
    # vectorized self-loop drop (a per-row Python predicate over 10^10
    # edges would dominate the round; Arrow mask is one kernel/batch)
    edges = edges.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("src"), t.column("dst")))),
        batch_format="pyarrow",
    )
    edges = edges.join(
        node_ds.map_batches(
            lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
        ),
        join_type="left_semi",
        num_partitions=width,
        on=("dst",),
        right_on=("nd_url",),
    )
    und = edges.union(
        edges.map_batches(
            lambda t: pa.table({"src": t.column("dst"), "dst": t.column("src")}),
            batch_format="pyarrow",
        )
    ).materialize()
    labels = node_ds.map_batches(
        lambda t: pa.table(
            {"url": t.column("url"), "lbl": t.column("url"), "own": t.column("url")}
        ),
        batch_format="pyarrow",
    )

    def vote_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "lbl"], as_index=False).agg(c=("lbl", "size"))
        return g.rename(columns={"dst": "url"}).astype({"c": "int64"})

    def argmax(df: pd.DataFrame) -> pa.Table:
        # arrow out with the join-side names (Ray 2.49's rename_columns
        # Project op rejects pandas blocks)
        df = df.sort_values(["c", "lbl"], ascending=[False, True], kind="stable")
        return pa.table(
            {
                "v_url": pa.array(df["url"].iloc[:1], pa.string()),
                "v_lbl": pa.array(df["lbl"].iloc[:1], pa.string()),
            }
        )

    for _ in range(iters):
        vote_parts = und.join(
            labels.select_columns(["url", "lbl"]),
            join_type="inner",
            num_partitions=width,
            on=("src",),
            right_on=("url",),
        ).map_batches(vote_partial, batch_format="pandas")
        # dual-path per-dst argmax (VERDICT r3 item 4, same device as
        # anchor_texts): the pre-combined (url, lbl, c) vote table is
        # bounded by the label vocabulary per node, NOT the edge count —
        # under the fold cap it folds on the driver and the argmax is
        # one vectorized sort + drop_duplicates, the winner map then
        # broadcasts into a per-batch pandas hash merge. This replaces
        # a per-URL Python map_groups call (62k calls at sf0.1) AND the
        # left_outer votes join. Beyond the cap the original
        # groupby-Sum + map_groups + join round runs unchanged.
        folded, parts = fold_or_reduce(vote_parts, ["url", "lbl"], {"c": "sum"}, cap=fold_cap)
        if folded is not None:
            w = folded.sort_values(
                ["url", "c", "lbl"], ascending=[True, False, True], kind="stable"
            ).drop_duplicates("url", keep="first")
            w_ref = ray.put(w[["url", "lbl"]].rename(columns={"lbl": "v_lbl"}))

            def apply_winners(df: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
                m = df[["url", "own"]].merge(ray.get(_w), on="url", how="left")
                return pd.DataFrame(
                    {"url": m["url"], "lbl": m["v_lbl"].fillna(m["own"]), "own": m["own"]}
                )

            labels = labels.map_batches(apply_winners, batch_format="pandas").materialize()
            continue
        votes = (
            parts.groupby(["url", "lbl"])
            .aggregate(Sum("c", alias_name="c"))
            .groupby("url")
            .map_groups(argmax, batch_format="pandas")
        )
        labels = (
            labels.select_columns(["url", "own"])
            .join(
                votes,
                join_type="left_outer",
                num_partitions=width,
                on=("url",),
                right_on=("v_url",),
            )
            .map_batches(
                lambda df: pd.DataFrame(
                    {"url": df["url"], "lbl": df["v_lbl"].fillna(df["own"]), "own": df["own"]}
                ),
                batch_format="pandas",
            )
            .materialize()
        )
    return labels.map_batches(
        lambda t: pa.table({"url": t.column("url"), "community": t.column("lbl")}),
        batch_format="pyarrow",
    )


# --- host-graph macro-structure (SCC / bow-tie / clustering) ---------------

def _page_hosts(pages: rd.Dataset) -> list[str]:
    """Sorted distinct page hosts via the dual-path distinct (driver
    fold under the ``ops.fold`` cap, groupby beyond)."""
    from .fold import fold_or_reduce

    def hosts_partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"host": pd.Series(dtype=object), "_n": pd.Series(dtype="int8")})
        h = _host_of(pd.Series(t.column("url").to_pylist())).drop_duplicates()
        return pd.DataFrame({"host": h, "_n": np.ones(len(h), dtype=np.int8)})

    folded, parts = fold_or_reduce(
        pages.map_batches(hosts_partial, batch_format="pyarrow"), ["host"], {"_n": "max"}
    )
    if folded is not None:
        return sorted(folded["host"].tolist())
    from ray.data.aggregate import Max

    return sorted(
        parts.groupby("host").aggregate(Max("_n", alias_name="_n")).to_pandas()["host"].tolist()
    )


def _weighted_host_graph(pages: rd.Dataset, min_links: int):
    """(page-host list, kept weighted edge table) on the driver.

    ``host_edges`` has already combined the O(edges) anchor stream to
    the O(hosts^2)-bounded weighted table (map-side partial + tiny
    groupby), so the driver pull here is host-bounded — the same
    justification as ``host_rank``'s bounded host table. ``min_links``
    prunes incidental cross-host links the way production host-graph
    builds threshold edge weights (one stray anchor must not merge two
    site families into one SCC)."""
    page_hosts = _page_hosts(pages)
    he = host_edges(pages).to_pandas()
    he = he[(he["src_host"] != he["dst_host"]) & (he["n_links"] >= min_links)]
    return sorted(page_hosts), he[["src_host", "dst_host"]].reset_index(drop=True)


def _kosaraju(hosts: list[str], edges: pd.DataFrame) -> np.ndarray:
    """Exact SCC ids (index of the lexicographically-smallest member)
    via iterative Kosaraju on the bounded host graph."""
    n = len(hosts)
    idx = pd.Index(hosts)
    si = idx.get_indexer(edges["src_host"]).astype(np.int64)
    di = idx.get_indexer(edges["dst_host"]).astype(np.int64)
    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(si, di):
        adj[s].append(int(d))
        radj[d].append(int(s))
    order: list[int] = []
    visited = np.zeros(n, dtype=bool)
    for s0 in range(n):
        if visited[s0]:
            continue
        visited[s0] = True
        stack: list[tuple[int, int]] = [(s0, 0)]
        while stack:
            v, i = stack[-1]
            if i < len(adj[v]):
                stack[-1] = (v, i + 1)
                w = adj[v][i]
                if not visited[w]:
                    visited[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
                stack.pop()
    comp = np.full(n, -1, dtype=np.int64)
    for s0 in reversed(order):
        if comp[s0] != -1:
            continue
        comp[s0] = s0
        dfs = [s0]
        while dfs:
            v = dfs.pop()
            for w in radj[v]:
                if comp[w] == -1:
                    comp[w] = s0
                    dfs.append(w)
    # canonical id: lexicographic min member per component (hosts is
    # sorted, so min index IS the min host string). comp is in node-
    # index order, so each root's FIRST occurrence is its min member —
    # one np.unique, no per-root scan.
    roots, first_idx, inv = np.unique(comp, return_index=True, return_inverse=True)
    return first_idx[inv].astype(np.int64)


def host_scc(pages: rd.Dataset, min_links: int = 500) -> rd.Dataset:
    """Strongly connected components of the weighted host graph —
    mirror-ring / spider-trap-ring detection (a ring of hosts that
    link each other above ``min_links`` is one SCC; a one-way feeder
    is not, which plain undirected components cannot distinguish).

    Nodes are every page host plus every endpoint of a kept edge
    (pure link targets — e.g. external hosts — become singleton or
    sink nodes). Exact iterative Kosaraju on the host-bounded graph;
    ``scc_id`` is the component's lexicographically smallest host."""
    page_hosts, he = _weighted_host_graph(pages, min_links)
    hosts = sorted(
        set(page_hosts) | set(he["src_host"].tolist()) | set(he["dst_host"].tolist())
    )
    if not hosts:
        return rd.from_arrow(
            pa.table({"host": pa.array([], pa.string()), "scc_id": pa.array([], pa.string())})
        )
    comp = _kosaraju(hosts, he)
    return rd.from_arrow(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "scc_id": pa.array([hosts[i] for i in comp], pa.string()),
            }
        )
    )


def host_bowtie(pages: rd.Dataset, min_links: int = 500) -> rd.Dataset:
    """Broder et al. 2000 bow-tie decomposition of the weighted host
    graph: CORE = the largest SCC (ties to the smallest scc_id), IN =
    hosts that reach the core, OUT = hosts the core reaches, OTHER =
    tendrils/disconnected. The classic web-macro-structure report a
    crawl planner reads before budgeting frontier expansion (OUT-only
    hosts never feed new URLs back; IN hosts are entry points)."""
    page_hosts, he = _weighted_host_graph(pages, min_links)
    hosts = sorted(
        set(page_hosts) | set(he["src_host"].tolist()) | set(he["dst_host"].tolist())
    )
    if not hosts:
        return rd.from_arrow(
            pa.table({"host": pa.array([], pa.string()), "region": pa.array([], pa.string())})
        )
    n = len(hosts)
    comp = _kosaraju(hosts, he)
    sizes = np.bincount(comp, minlength=n)
    # largest SCC, tie -> smallest canonical id (= smallest index)
    core_root = int(np.argmax(sizes))
    in_core = comp == core_root
    idx = pd.Index(hosts)
    si = idx.get_indexer(he["src_host"]).astype(np.int64)
    di = idx.get_indexer(he["dst_host"]).astype(np.int64)
    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(si, di):
        adj[s].append(int(d))
        radj[d].append(int(s))

    def bfs(seeds: np.ndarray, nbrs: list[list[int]]) -> np.ndarray:
        seen = seeds.copy()
        frontier = list(np.where(seeds)[0])
        while frontier:
            nxt = []
            for v in frontier:
                for w in nbrs[v]:
                    if not seen[w]:
                        seen[w] = True
                        nxt.append(w)
            frontier = nxt
        return seen

    reaches_core = bfs(in_core, radj)  # walk reverse edges from core
    reached_from_core = bfs(in_core, adj)
    region = np.where(
        in_core,
        "CORE",
        np.where(reaches_core, "IN", np.where(reached_from_core, "OUT", "OTHER")),
    )
    return rd.from_arrow(
        pa.table({"host": pa.array(hosts, pa.string()), "region": pa.array(list(region), pa.string())})
    )


def host_clustering(pages: rd.Dataset) -> rd.Dataset:
    """Local clustering coefficient per host over the undirected
    distinct host graph: c(v) = 2·triangles(v) / (d(v)·(d(v)−1)) —
    the normalized density signal on top of :func:`host_triangles`
    (raw triangle counts grow with degree; the coefficient separates
    a mirror ring, c≈1, from a high-degree topical hub, c≈0).

    Triangles and degrees come from the same bounded undirected pair
    table; one double division per host in a fixed operand order."""
    from ray.data.aggregate import Sum

    und = _undirected_host_pairs(pages)
    if und.count() <= _DRIVER_TRI_EDGES:
        df = und.to_pandas()
        tri = _triangles_driver(df)
        deg = (
            pd.DataFrame({"host": pd.concat([df["a"], df["b"]], ignore_index=True)})
            .groupby("host", as_index=False)
            .agg(d=("host", "size"))
        )
    else:
        tri = host_triangles(pages)
        deg = (
            und.map_batches(
                lambda d: pd.DataFrame({"host": pd.concat([d["a"], d["b"]])})
                .groupby("host", as_index=False)
                .agg(n=("host", "size")),
                batch_format="pandas",
            )
            .groupby("host")
            .aggregate(Sum("n", alias_name="d"))
            .to_pandas()
        )
    out = tri.merge(deg, on="host", how="left")
    d = out["d"].fillna(0).astype(np.int64)
    t = out["n_triangles"].astype(np.int64)
    denom = d * (d - 1)
    coef = np.where(denom > 0, 2.0 * t.to_numpy(np.float64) / denom.to_numpy(np.float64), 0.0)
    res = pd.DataFrame(
        {
            "host": out["host"],
            "n_triangles": t,
            "degree": d,
            "clustering": coef,
        }
    ).sort_values("host", ignore_index=True)
    return rd.from_pandas(res)


def avg_neighbor_degree(
    pages: rd.Dataset, broadcast_nodes: int = _BROADCAST_NODES
) -> rd.Dataset:
    """Average out-degree of each page's internal link targets
    (multiplicity counted) — the assortativity signal: spider traps
    and link farms point at pages that themselves fan out broadly,
    while editorial pages point at low-degree leaves.

    Dual path: under the node bound the (hash-sorted) out-degree
    column broadcasts once and the whole op is ROW-LOCAL — a page's
    anchors live in its own html cell, so sum/count of target degrees
    needs no exchange at all. Beyond, outlinks ⨝ degrees with
    map-side (src, sum, cnt) partials and one url-keyed Sum groupby.
    Pages with no internal targets are absent (indegree semantics);
    one double division per page, operand order sum/cnt."""
    n_nodes = pages.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "sum_nbr_deg": pa.array([], pa.int64()),
                    "n_nbrs": pa.array([], pa.int64()),
                    "avg_nbr_deg": pa.array([], pa.float64()),
                }
            )
        )
    node_ds = pages.select_columns(["url"])
    if n_nodes <= broadcast_nodes:
        out = _avg_nbr_deg_broadcast(pages, node_ds, n_nodes)
        if out is not None:
            return out
    return _avg_nbr_deg_join(pages, node_ds)


def _avg_nbr_deg_broadcast(pages, node_ds, n_nodes):
    nodes = _sorted_node_hashes(node_ds, n_nodes)
    if nodes is None:
        return None
    hashes, urls = nodes
    # degree column aligned to hash order: outlink_degree is row-local
    # and node-bounded (one row per page), same driver pull the node
    # table itself already made
    dd = outlink_degree(pages).to_pandas()
    deg = np.zeros(n_nodes, dtype=np.int64)
    pos0 = np.searchsorted(hashes, _hash64(np.asarray(dd["url"], dtype=object)))
    deg[pos0] = dd["out_degree"].to_numpy(np.int64)
    h_ref = ray.put(hashes)
    d_ref = ray.put(deg)

    def row_local(t: pa.Table, _h=h_ref, _d=d_ref) -> pd.DataFrame:
        hs = ray.get(_h)
        dg = ray.get(_d)
        if t.num_rows == 0:
            return pd.DataFrame(
                {
                    "url": pd.Series(dtype=object),
                    "sum_nbr_deg": pd.Series(dtype="int64"),
                    "n_nbrs": pd.Series(dtype="int64"),
                    "avg_nbr_deg": pd.Series(dtype="float64"),
                }
            )
        html = t.column("html")
        urls_b = t.column("url").to_pylist()
        out_u, out_s, out_c = [], [], []
        for i in range(t.num_rows):
            tgts = HREF_RE.findall(memoryview(html[i].as_buffer()))
            if not tgts:
                continue
            th = _hash64([x.decode("utf-8", "surrogateescape") for x in tgts])
            pos = np.searchsorted(hs, th)
            pos[pos >= len(hs)] = len(hs) - 1
            found = hs[pos] == th
            if not found.any():
                continue
            out_u.append(urls_b[i])
            out_s.append(int(dg[pos[found]].sum()))
            out_c.append(int(found.sum()))
        s = np.array(out_s, dtype=np.int64)
        c = np.array(out_c, dtype=np.int64)
        return pd.DataFrame(
            {
                "url": pd.Series(out_u, dtype=object),
                "sum_nbr_deg": s,
                "n_nbrs": c,
                "avg_nbr_deg": s.astype(np.float64) / c if len(c) else np.array([], dtype=np.float64),
            }
        )

    return pages.map_batches(row_local, batch_format="pyarrow")


def _avg_nbr_deg_join(pages, node_ds):
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    deg = outlink_degree(pages).map_batches(
        lambda t: pa.table({"d_url": t.column("url"), "d": t.column("out_degree")}),
        batch_format="pyarrow",
    )
    links = outlinks(pages).join(
        deg, join_type="inner", num_partitions=width, on=("dst",), right_on=("d_url",)
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", as_index=False).agg(s=("d", "sum"), c=("d", "size"))
        return pd.DataFrame(
            {"url": g["src"], "s": g["s"].astype("int64"), "c": g["c"].astype("int64")}
        )

    summed = (
        links.map_batches(partial, batch_format="pandas")
        .groupby("url")
        .aggregate(Sum("s", alias_name="sum_nbr_deg"), Sum("c", alias_name="n_nbrs"))
    )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        s = df["sum_nbr_deg"].to_numpy(np.int64)
        c = df["n_nbrs"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "url": df["url"],
                "sum_nbr_deg": s,
                "n_nbrs": c,
                "avg_nbr_deg": s.astype(np.float64) / c,
            }
        )

    return summed.map_batches(emit, batch_format="pandas")


def outlink_locality(pages: rd.Dataset) -> rd.Dataset:
    """Per-host link-locality profile: how many anchors stay on the
    same host (``n_self``), point at another crawled host
    (``n_internal``) or leave the corpus (``n_external``) — the
    frontier-expansion diagnostic (an external-heavy host feeds
    discovery; a self-heavy host is navigation-bound and yields no new
    domains). ``frac_external`` is one double division per host.

    Scale shape: the page-host set broadcasts once as a sorted array
    (host-bounded); classification is row-local searchsorted; per-batch
    (host, 3 counters) partials fold dual-path."""
    from .fold import fold_or_reduce

    hosts = np.array(_page_hosts(pages), dtype=object)
    h_ref = ray.put(hosts)
    links = outlinks(pages)

    def partial(df: pd.DataFrame, _h=h_ref) -> pd.DataFrame:
        cols = {
            "host": pd.Series(dtype=object),
            "n_self": pd.Series(dtype="int64"),
            "n_internal": pd.Series(dtype="int64"),
            "n_external": pd.Series(dtype="int64"),
        }
        if df.empty:
            return pd.DataFrame(cols)
        hs = ray.get(_h)
        sh = _host_of(df["src"]).to_numpy(dtype=object)
        dh = _host_of(df["dst"]).to_numpy(dtype=object)
        pos = np.searchsorted(hs, dh)
        pos_c = np.minimum(pos, max(len(hs) - 1, 0))
        known = (len(hs) > 0) & (hs[pos_c] == dh)
        is_self = dh == sh
        g = pd.DataFrame(
            {
                "host": sh,
                "n_self": is_self.astype(np.int64),
                "n_internal": (known & ~is_self).astype(np.int64),
                "n_external": (~known).astype(np.int64),
            }
        ).groupby("host", as_index=False).sum()
        return g

    parts = links.map_batches(partial, batch_format="pandas")
    folded, parts = fold_or_reduce(
        parts, ["host"], {"n_self": "sum", "n_internal": "sum", "n_external": "sum"}
    )
    if folded is None:
        from ray.data.aggregate import Sum

        folded = (
            parts.groupby("host")
            .aggregate(
                Sum("n_self", alias_name="n_self"),
                Sum("n_internal", alias_name="n_internal"),
                Sum("n_external", alias_name="n_external"),
            )
            .to_pandas()
        )
    total = (folded["n_self"] + folded["n_internal"] + folded["n_external"]).astype(np.int64)
    out = folded.assign(
        frac_external=folded["n_external"].astype(np.float64) / total
    ).sort_values("host", ignore_index=True)
    return rd.from_pandas(out.astype({"n_self": "int64", "n_internal": "int64", "n_external": "int64"}))


def assortativity(pages: rd.Dataset, broadcast_nodes: int = _BROADCAST_NODES) -> rd.Dataset:
    """Global degree assortativity: Pearson correlation of
    (out-degree(src), in-degree(dst)) over every internal directed
    edge, multiplicity counted — the one-number mixing diagnostic
    (r < 0: hubs point at leaves, editorial web; r > 0: hubs citing
    hubs, the link-farm signature). Newman 2002 via the exact-int64
    moment device of ``rel_corr``: per-batch moment partials are
    ROW-LOCAL (a page's own anchor count is x; y probes the broadcast
    in-degree column), the bounded partial rows fold on the driver
    with arbitrary-precision Python ints, and ONE identical float
    expression finishes on both engines. Output: a single row
    (n_edges, sum moments, r)."""
    n_nodes = pages.count()
    empty = pd.DataFrame(
        {
            "n_edges": pd.Series([0], dtype="int64"),
            "r": pd.Series([0.0], dtype="float64"),
        }
    )
    if n_nodes == 0:
        return rd.from_pandas(empty)
    node_ds = pages.select_columns(["url"])
    nodes = _sorted_node_hashes(node_ds, n_nodes) if n_nodes <= broadcast_nodes else None
    if nodes is None:
        return _assortativity_join(pages, node_ds, empty)
    hashes, urls = nodes
    # in-degree column aligned to hash order (multiplicity counted);
    # indegree also reports EXTERNAL targets — mask them out (the edge
    # set below is internal-only, so their degree is never probed)
    ind = indegree(pages).to_pandas()
    deg_in = np.zeros(len(hashes), dtype=np.int64)
    ih = _hash64(np.asarray(ind["url"], dtype=object))
    pos0 = np.searchsorted(hashes, ih)
    pos0c = np.minimum(pos0, len(hashes) - 1)
    known = hashes[pos0c] == ih
    deg_in[pos0c[known]] = ind["in_degree"].to_numpy(np.int64)[known]
    h_ref = ray.put(hashes)
    d_ref = ray.put(deg_in)

    def moments(t: pa.Table, _h=h_ref, _d=d_ref) -> pd.DataFrame:
        hs = ray.get(_h)
        dg = ray.get(_d)
        n = sx = sy = sxx = syy = sxy = 0
        html = t.column("html")
        for i in range(t.num_rows):
            tgts = HREF_RE.findall(memoryview(html[i].as_buffer()))
            if not tgts:
                continue
            x = len(tgts)  # out-degree of src is row-local
            th = _hash64([b.decode("utf-8", "surrogateescape") for b in tgts])
            pos = np.searchsorted(hs, th)
            pos[pos >= len(hs)] = len(hs) - 1
            found = hs[pos] == th
            if not found.any():
                continue
            ys = dg[pos[found]]
            k = int(found.sum())
            n += k
            sx += x * k
            sxx += x * x * k
            sy += int(ys.sum())
            syy += int((ys * ys).sum())
            sxy += x * int(ys.sum())
        return pd.DataFrame(
            {
                "n": pd.Series([n], dtype="int64"),
                "sx": pd.Series([sx], dtype="int64"),
                "sy": pd.Series([sy], dtype="int64"),
                "sxx": pd.Series([sxx], dtype="int64"),
                "syy": pd.Series([syy], dtype="int64"),
                "sxy": pd.Series([sxy], dtype="int64"),
            }
        )

    parts = pages.map_batches(moments, batch_format="pyarrow").to_pandas()
    return rd.from_pandas(_assort_finish(parts, empty))


def _assort_finish(parts: pd.DataFrame, empty: pd.DataFrame) -> pd.DataFrame:
    # arbitrary-precision driver fold: int64 partials are batch-safe,
    # the global sums may not be
    n = sum(int(v) for v in parts["n"])
    if n == 0:
        return empty
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    sxy = sum(int(v) for v in parts["sxy"])
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx) ** 0.5 * float(n * syy - sy * sy) ** 0.5
    r = num / den if den > 0 else 0.0
    return pd.DataFrame({"n_edges": pd.Series([n], dtype="int64"), "r": pd.Series([r], dtype="float64")})


def _assortativity_join(pages, node_ds, empty: pd.DataFrame) -> rd.Dataset:
    """Beyond the broadcast bound: outlinks ⨝ in-degree at cluster
    width, per-batch moment partials, driver big-int fold."""
    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    od = outlink_degree(pages).map_batches(
        lambda t: pa.table({"o_url": t.column("url"), "x": t.column("out_degree")}),
        batch_format="pyarrow",
    )
    ind = indegree(pages).map_batches(
        lambda t: pa.table({"i_url": t.column("url"), "y": t.column("in_degree")}),
        batch_format="pyarrow",
    )
    # internal edges only: an external target's in-degree exists in the
    # ind table but the correlation is defined over the crawled graph
    edges = (
        outlinks(pages)
        .join(
            node_ds.map_batches(
                lambda t: pa.table({"nd_url": t.column("url")}), batch_format="pyarrow"
            ),
            join_type="left_semi",
            num_partitions=width,
            on=("dst",),
            right_on=("nd_url",),
        )
        .join(od, join_type="inner", num_partitions=width, on=("src",), right_on=("o_url",))
        .join(ind, join_type="inner", num_partitions=width, on=("dst",), right_on=("i_url",))
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n": pd.Series([len(df)], dtype="int64"),
                "sx": pd.Series([int(x.sum())], dtype="int64"),
                "sy": pd.Series([int(y.sum())], dtype="int64"),
                "sxx": pd.Series([int((x * x).sum())], dtype="int64"),
                "syy": pd.Series([int((y * y).sum())], dtype="int64"),
                "sxy": pd.Series([int((x * y).sum())], dtype="int64"),
            }
        )

    parts = edges.map_batches(moments, batch_format="pandas").to_pandas()
    return rd.from_pandas(_assort_finish(parts, empty))


def reciprocity_rate(pages: rd.Dataset) -> rd.Dataset:
    """Global link reciprocity: the fraction of distinct directed
    internal-or-external edges whose reverse also exists — one number
    separating an editorial web (low: citation flows one way) from a
    link-exchange mesh (high: "you link me, I link you"). Newman et
    al.'s r = 2·pairs / edges over the same distinct-edge universe as
    :func:`reciprocal_links` (self-loops dropped).

    Scale shape: the identical idempotent presence-bit fold (Max of
    fwd/rev per unordered pair) — driver fold under the cap; beyond,
    the pair-keyed groupby-Max reduced to ONE row of int64 partial
    sums per block, big-int folded on the driver. One double
    division."""
    from ray.data.aggregate import Max

    from .fold import DRIVER_KEYS, fold_or_reduce

    edges = outlinks(pages)
    empty_bits = pd.DataFrame(
        {
            "url_a": pd.Series(dtype=str),
            "url_b": pd.Series(dtype=str),
            "fwd": pd.Series(dtype="int64"),
            "rev": pd.Series(dtype="int64"),
        }
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty_bits
        df = df[df["src"] != df["dst"]]
        if df.empty:
            return empty_bits
        lo = df["src"].where(df["src"] < df["dst"], df["dst"])
        hi = df["dst"].where(df["src"] < df["dst"], df["src"])
        fwd = (df["src"] < df["dst"]).astype("int64")
        return (
            pd.DataFrame({"url_a": lo, "url_b": hi, "fwd": fwd, "rev": 1 - fwd})
            .groupby(["url_a", "url_b"], as_index=False)
            .max()
        )

    folded, parts = fold_or_reduce(
        edges.map_batches(fold, batch_format="pandas"),
        ["url_a", "url_b"],
        {"fwd": "max", "rev": "max"},
        DRIVER_KEYS,
    )

    def finish(n_fwd: int, n_rev: int, n_pairs: int) -> pd.DataFrame:
        d = n_fwd + n_rev
        return pd.DataFrame(
            {
                "n_edges": pd.Series([d], dtype="int64"),
                "n_reciprocal_pairs": pd.Series([n_pairs], dtype="int64"),
                "reciprocity": pd.Series([2.0 * n_pairs / d if d else 0.0], dtype="float64"),
            }
        )

    if folded is not None:
        both = (folded["fwd"] == 1) & (folded["rev"] == 1)
        return rd.from_pandas(
            finish(int(folded["fwd"].sum()), int(folded["rev"].sum()), int(both.sum()))
        )
    agg = parts.groupby(["url_a", "url_b"]).aggregate(
        Max("fwd", alias_name="fwd"), Max("rev", alias_name="rev")
    )

    def partial_sums(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "f": pd.Series([int(df["fwd"].sum())], dtype="int64"),
                "r": pd.Series([int(df["rev"].sum())], dtype="int64"),
                "p": pd.Series([int(((df["fwd"] == 1) & (df["rev"] == 1)).sum())], dtype="int64"),
            }
        )

    sums = agg.map_batches(partial_sums, batch_format="pandas").to_pandas()
    return rd.from_pandas(
        finish(
            sum(int(v) for v in sums["f"]),
            sum(int(v) for v in sums["r"]),
            sum(int(v) for v in sums["p"]),
        )
    )


def lang_link_matrix(
    pages: rd.Dataset, broadcast_nodes: int = _BROADCAST_NODES
) -> rd.Dataset:
    """Cross-language link matrix: (lang_src, lang_dst, n_links) over
    internal directed edges, multiplicity counted — the web-science
    table behind multilingual crawl planning (which languages cite
    which decides where a frontier seeded in one language will drift;
    cf. the Common-Crawl language-graph reports). ``pages`` must carry
    ``url, html, lang``.

    Dual path: under the node bound the url→lang column broadcasts
    once (langs dictionary-encoded to uint16) and the op is ROW-LOCAL —
    the source language rides the page row, target languages resolve
    against the broadcast array; per-batch (src, dst) count partials
    fold over the bounded lang×lang table. Beyond, links ⨝ lang-table
    with map-side combine and one small Sum groupby."""
    from .fold import fold_or_reduce

    n_nodes = pages.count()
    empty = pa.table(
        {
            "lang_src": pa.array([], pa.string()),
            "lang_dst": pa.array([], pa.string()),
            "n_links": pa.array([], pa.int64()),
        }
    )
    if n_nodes == 0:
        return rd.from_arrow(empty)
    node_ds = pages.select_columns(["url"])
    nodes = _sorted_node_hashes(node_ds, n_nodes) if n_nodes <= broadcast_nodes else None
    if nodes is None:
        return _lang_links_join(pages, node_ds)
    hashes, urls = nodes
    # url -> lang, dictionary-encoded, aligned to hash order (the lang
    # column is node-bounded: same driver pull as the node table)
    lt = pages.select_columns(["url", "lang"]).to_pandas()
    vocab = sorted(lt["lang"].astype(str).unique().tolist())
    code = {l: i for i, l in enumerate(vocab)}
    lang_arr = np.zeros(len(hashes), dtype=np.uint16)
    pos0 = np.searchsorted(hashes, _hash64(np.asarray(lt["url"], dtype=object)))
    lang_arr[pos0] = lt["lang"].astype(str).map(code).to_numpy(np.uint16)
    h_ref = ray.put(hashes)
    l_ref = ray.put(lang_arr)
    v_ref = ray.put(vocab)

    def partial(t: pa.Table, _h=h_ref, _l=l_ref, _v=v_ref) -> pd.DataFrame:
        cols = {
            "lang_src": pd.Series(dtype=object),
            "lang_dst": pd.Series(dtype=object),
            "n_links": pd.Series(dtype="int64"),
        }
        if t.num_rows == 0:
            return pd.DataFrame(cols)
        hs = ray.get(_h)
        la = ray.get(_l)
        vocab = ray.get(_v)
        html = t.column("html")
        own = t.column("lang").to_pylist()
        srcs, dsts = [], []
        for i in range(t.num_rows):
            tgts = HREF_RE.findall(memoryview(html[i].as_buffer()))
            if not tgts:
                continue
            th = _hash64([b.decode("utf-8", "surrogateescape") for b in tgts])
            pos = np.searchsorted(hs, th)
            pos[pos >= len(hs)] = len(hs) - 1
            found = hs[pos] == th
            if not found.any():
                continue
            k = int(found.sum())
            srcs.extend([own[i]] * k)
            dsts.extend(vocab[c] for c in la[pos[found]])
        if not srcs:
            return pd.DataFrame(cols)
        g = (
            pd.DataFrame(
                {"lang_src": srcs, "lang_dst": dsts, "n_links": np.ones(len(srcs), dtype=np.int64)}
            )
            .groupby(["lang_src", "lang_dst"], as_index=False)
            .sum()
        )
        return g.astype({"n_links": "int64"})

    parts = pages.map_batches(partial, batch_format="pyarrow")
    folded, parts = fold_or_reduce(parts, ["lang_src", "lang_dst"], {"n_links": "sum"})
    if folded is not None:
        return rd.from_pandas(
            folded.sort_values(["lang_src", "lang_dst"], ignore_index=True).astype(
                {"n_links": "int64"}
            )
        )
    from ray.data.aggregate import Sum

    return parts.groupby(["lang_src", "lang_dst"]).aggregate(Sum("n_links", alias_name="n_links"))


def _lang_links_join(pages, node_ds):
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus

    width = max(2, cluster_cpus(8))
    lt = pages.map_batches(
        lambda t: pa.table({"l_url": t.column("url"), "l_lang": t.column("lang")}),
        batch_format="pyarrow",
    )
    edges = (
        outlinks(pages)
        .join(lt, join_type="inner", num_partitions=width, on=("src",), right_on=("l_url",))
        .map_batches(
            lambda t: pa.table({"lang_src": t.column("l_lang"), "dst": t.column("dst")}),
            batch_format="pyarrow",
        )
        .join(
            lt.map_batches(
                lambda t: pa.table({"d_url": t.column("l_url"), "lang_dst": t.column("l_lang")}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=width,
            on=("dst",),
            right_on=("d_url",),
        )
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang_src", "lang_dst"], as_index=False).agg(n_links=("lang_src", "size"))
        return g.astype({"n_links": "int64"})

    return (
        edges.map_batches(partial, batch_format="pandas")
        .groupby(["lang_src", "lang_dst"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )
