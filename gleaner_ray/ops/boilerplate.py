"""Per-host boilerplate-line detection and removal over a crawl corpus.

Web-text pipelines strip nav/footer/template lines before training
(CCNet splits pages into paragraphs and drops the corpus-frequent ones;
RefinedWeb's line-wise filters are the same idea scoped to the page).
The reference engine stores raw page bytes and has no cleaning stage —
this operator supplies it for the training-data plane: a line is
*boilerplate for host h* when it appears on at least ``min_num/min_den``
of h's pages, and every page is re-scored with its boilerplate lines
removed.

Output: one row per page — ``(url, host, n_lines, n_boiler,
clean_chars)`` where ``n_boiler`` counts removed line instances and
``clean_chars`` sums the character length of the kept lines. Exact
integer semantics (the threshold compares ``n * min_den >= pages *
min_num`` in int64), so the result is hash-identical to the SQL oracle
at any parallelism.

Scale shape — two streaming passes, pages never shuffle:

1. **Frequency pass**: per batch, dedupe ``(url, line)`` and emit
   partial counts keyed ``(host, line_hash64)``; a url lives in exactly
   one batch row, so summing partials over batches is an exact
   DISTINCT-url count. The groupby key cardinality is the corpus's
   distinct-line count — large but map-side combinable, the same shape
   as every partial-agg in this repo.
2. **Threshold + broadcast**: per-host page totals come from a pruned
   url-only read (tiny table, bounded by host count). The boilerplate
   set itself is *provably bounded regardless of corpus size*: a line
   on >= num/den of a host's pages uses that share of the host's
   line-slots, so a host has at most ``den/num * lines_per_page``
   distinct boilerplate lines (~40 here at den/num=10, 4 lines/page).
   Broadcast cost is |hosts| x that; both driver materializations are
   guarded by ``max_broadcast``.
3. **Clean pass**: ``map_batches`` re-reads pages and probes the
   broadcast ``{host: set(line_hash)}`` — row-local, no exchange.

Seam for mega-host-cardinality corpora (10^7+ hosts, where the
broadcast set outgrows ``max_broadcast``): co-partition pages by
``hash(host)`` once and compute freq/threshold/clean inside each
partition — ``domain_cap``'s shape with the whole operator local to the
group. Not needed at any tested scale; the guard raises with this
pointer instead of silently degrading.

Line identity inside the engine is a vectorized 64-bit siphash
(``pd.util.hash_array`` — one C call per batch; the original per-line
md5 generator was the op's hottest loop); the oracle joins raw line
strings, equivalent short of 64-bit collisions (~n^2/2^64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["boilerplate_clean"]

_HOST_RE = r"^https://([^/]+)/"

_LINE_HASH_KEY = "boilerplate_line"  # 16 bytes


def _hash64(lines) -> np.ndarray:
    return pd.util.hash_array(np.asarray(lines, dtype=object), hash_key=_LINE_HASH_KEY)


def _decode_split(df: pd.DataFrame) -> pd.DataFrame:
    """(url, html) batch -> exploded (url, host, line) frame."""
    html = df["html"]
    if len(html) and isinstance(html.iloc[0], (bytes, bytearray, memoryview)):
        text = html.map(lambda b: str(b, "utf-8", "replace"))
    else:
        text = html.astype(str)
    out = pd.DataFrame(
        {
            "url": df["url"].to_numpy(),
            "host": df["url"].str.extract(_HOST_RE, expand=False).to_numpy(),
            "line": text.str.split("\n").to_numpy(),
        }
    ).explode("line", ignore_index=True)
    return out


def boilerplate_clean(
    pages_dir: str,
    min_num: int = 1,
    min_den: int = 10,
    max_broadcast: int = 5_000_000,
):
    """Detect per-host boilerplate lines and score every page cleaned.

    ``pages_dir`` is read twice with column pruning (url-only for host
    totals; url+html for the frequency and clean passes) — cheaper than
    materializing the corpus between passes.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    # -- per-host page totals: pruned metadata-only read ----------------
    def host_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"host": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")})
        vc = df["url"].str.extract(_HOST_RE, expand=False).value_counts()
        return pd.DataFrame({"host": vc.index.to_numpy(), "n": vc.to_numpy().astype("int64")})

    from .fold import fold_or_reduce

    host_parts = rd.read_parquet(pages_dir, columns=["url"]).map_batches(
        host_partial, batch_format="pandas"
    )
    hostn, host_parts = fold_or_reduce(host_parts, ["host"], {"n": "sum"}, max_broadcast)
    if hostn is None:
        # fold overflow only bounds PARTIAL rows, not true cardinality:
        # reduce distributed (over the materialized partials), THEN
        # apply the real distinct-host guard
        hostn = (
            host_parts.groupby("host")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
        )
        if len(hostn) > max_broadcast:
            raise ValueError(
                "host cardinality %d exceeds max_broadcast=%d: switch to the "
                "host-co-partitioned variant (see module doc seam)"
                % (len(hostn), max_broadcast)
            )
    host_pages = dict(zip(hostn["host"], hostn["n"].astype("int64")))

    # -- frequency pass: exact distinct-url counts per (host, line) -----
    def freq_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "host": pd.Series([], dtype=str),
                    "lh": pd.Series([], dtype="uint64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        ex = _decode_split(df)
        ex["lh"] = _hash64(ex["line"].to_numpy())
        # a url is whole within this batch: per-batch (url, line) dedupe
        # then count == exact per-batch COUNT(DISTINCT url) partial
        ded = ex.drop_duplicates(["url", "lh"])
        g = ded.groupby(["host", "lh"], sort=False).size()
        out = g.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    freq_parts = rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        freq_partial, batch_format="pandas"
    )
    # dual-path reduce (ops.fold): the distinct (host, line) table folds
    # on the driver under the cap; the distributed groupby-Sum remains
    # the wide-corpus fallback
    from .fold import fold_or_reduce as _for

    folded, freq_parts = _for(freq_parts, ["host", "lh"], {"n": "sum"}, max_broadcast)

    # integer threshold: n * den >= pages * num  (no float semantics)
    pages_ref = ray.put(host_pages)

    def over_threshold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["host", "lh"]]
        hp = ray.get(pages_ref)
        tot = df["host"].map(hp).fillna(0).astype("int64").to_numpy()
        keep = df["n_urls"].to_numpy().astype("int64") * min_den >= tot * min_num
        return df.loc[keep, ["host", "lh"]]

    if folded is not None:
        sel = over_threshold(folded.rename(columns={"n": "n_urls"}))
        boiler_rows = [{"host": h, "lh": lh} for h, lh in zip(sel["host"], sel["lh"])]
    else:
        freq = freq_parts.groupby(["host", "lh"]).aggregate(Sum("n", alias_name="n_urls"))
        boiler_rows = freq.map_batches(over_threshold, batch_format="pandas").take_all()
    if len(boiler_rows) > max_broadcast:
        raise ValueError(
            "boilerplate set %d exceeds max_broadcast=%d: lower min_num/min_den "
            "or use the host-co-partitioned variant (module doc seam)" % (len(boiler_rows), max_broadcast)
        )
    by_host: dict[str, list] = {}
    for r in boiler_rows:
        by_host.setdefault(r["host"], []).append(r["lh"])
    boiler = {h: np.sort(np.asarray(v, dtype=np.uint64)) for h, v in by_host.items()}
    boiler_ref = ray.put(boiler)

    # -- clean pass: broadcast probe, row-local ------------------------
    def clean(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "url": pd.Series([], dtype=str),
                    "host": pd.Series([], dtype=str),
                    "n_lines": pd.Series([], dtype="int64"),
                    "n_boiler": pd.Series([], dtype="int64"),
                    "clean_chars": pd.Series([], dtype="int64"),
                }
            )
        bset = ray.get(boiler_ref)
        ex = _decode_split(df)
        ex["lh"] = _hash64(ex["line"].to_numpy())
        ex["len"] = ex["line"].str.len().astype("int64")
        lhs = ex["lh"].to_numpy()
        # vectorized membership: one np.isin per host present in the
        # batch (hosts per batch are few; lines per host are many)
        is_b = np.zeros(len(ex), dtype=bool)
        for h, idx in ex.groupby("host", sort=False).indices.items():
            arr = bset.get(h)
            if arr is not None and len(arr):
                is_b[idx] = np.isin(lhs[idx], arr)
        ex["boil"] = is_b.astype("int64")
        ex["kept_chars"] = np.where(is_b, 0, ex["len"].to_numpy())
        g = ex.groupby(["url", "host"], sort=False).agg(
            n_lines=("lh", "size"), n_boiler=("boil", "sum"), clean_chars=("kept_chars", "sum")
        )
        out = g.reset_index()
        for c in ("n_lines", "n_boiler", "clean_chars"):
            out[c] = out[c].astype("int64")
        return out

    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        clean, batch_format="pandas"
    )
