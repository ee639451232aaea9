"""Dataset splitting and sequence packing for training-data pipelines.

- ``hash_split``: deterministic train/holdout assignment by content-free
  key hash (md5 of the stringified key) — the standard way to split a
  corpus so the assignment is stable across runs, machines and engine
  versions, and joins with nothing.
- ``pack_sequences``: assign each document to a fixed token-budget pack
  (the "sequence packing" step before LLM training): documents in
  ascending doc_id order are laid out contiguously and a document starts
  pack ``cum_tokens_before // budget``.  Distributed as a two-level
  prefix-sum: coarse doc_id buckets aggregate token subtotals (one small
  groupby), the driver prefix-sums the bounded bucket table, and each
  bucket then assigns offsets vectorized with its broadcast base offset.
  Partitioning assumption: one bucket's rows fit one group task — at
  10^10 docs pick ``bucket_size`` so the bucket table stays driver-sized
  (1e6 buckets of 1e4 docs); a tree prefix-sum is the documented seam
  beyond that.

Both contracts are ANSI-SQL-expressible (md5 comparison against a hex
literal; SUM OVER ... ROWS UNBOUNDED PRECEDING), so the driver oracle
checks them value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = [
    "bernoulli_weighted",
    "dsir_weights",
    "df_rarity",
    "domain_cap",
    "temperature_mix",
    "uniform_sample_n",
    "hash_split",
    "epoch_plan",
    "pack_sequences",
    "pack_counts",
    "split_threshold_hex",
    "stratified_sample",
    "source_mix_balance",
    "vocab_overlap",
    "source_tv_distance",
    "shuffle_positions",
    "interleave_order",
    "kfold_assign",
    "group_sample_n",
    "rank_by_key",
]


def split_threshold_hex(frac: float) -> str:
    """Lowercase hex-comparable literal h such that P(md5_hex < h) ==
    frac under a uniform hash. Shared by the engine and the SQL oracle,
    so float rounding in the multiplication cannot diverge the two.

    Boundary clamps (the naive formula returns a 33-char string at
    frac=1.0, which lexicographically classifies digests starting with
    '2'..'f' as holdout): 'g' sorts after every 32-char hex digest in
    both Python and SQL string comparison -> all-train; the all-zeros
    literal admits nothing -> all-holdout."""
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "0" * 32
    return "%032x" % int(frac * (1 << 128))


def hash_split(ds, frac: float = 0.9, key: str = "doc_id"):
    """Adds ``split`` = 'train'|'holdout': md5(str(key)) < threshold(frac).

    Pure per-row hashing — no shuffle, no state; re-runs and appends
    assign identically."""
    thresh = split_threshold_hex(frac)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        hs = [hashlib.md5(str(k).encode()).hexdigest() for k in df[key]]
        return pd.DataFrame(
            {
                key: df[key],
                "split": ["train" if h < thresh else "holdout" for h in hs],
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def stratified_sample(
    ds,
    fracs: dict[str, float],
    group_col: str = "lang",
    default_frac: float = 1.0,
    key: str = "doc_id",
):
    """Deterministic per-group downsampling (the data-mixing step of a
    training-data pipeline: e.g. keep 10% of English, all of the rest).

    Keep a row iff ``md5(str(key)) < threshold(frac_of_its_group)`` —
    the same stable-hash contract as ``hash_split``: no shuffle, no
    state, identical assignment across runs, machines and engines, and
    composable with it (the hashes are keyed on the same column, so a
    sampled corpus splits consistently)."""
    thresholds = {g: split_threshold_hex(f) for g, f in fracs.items()}
    default_thresh = split_threshold_hex(default_frac)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        hs = pd.Series(
            [hashlib.md5(str(k).encode()).hexdigest() for k in df[key]], index=df.index
        )
        th = df[group_col].map(lambda g: thresholds.get(g, default_thresh))
        return df[hs < th]

    return ds.map_batches(pick, batch_format="pandas")


def pack_sequences(ds, budget: int = 2048, bucket_size: int = 1000, key: str = "doc_id"):
    """(doc_id, n_tokens, offset_tokens, pack_id) with documents packed
    contiguously in ascending ``key`` order; ``pack_id = offset //
    budget``.

    Three stages: vectorized whitespace token counts (same contract as
    ``token_stats.n_tokens_ws``); per-bucket subtotal groupby (the only
    exchange — bucket count rows, not doc count); per-bucket offset
    assignment with the driver's prefix-summed bucket bases broadcast
    via ``ray.put``."""
    from gleaner_ray.ops.text import token_stats

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {key: df[key], "n_tokens": df["n_tokens_ws"].astype("int64")}
        )

    counts = (
        ds.map_batches(token_stats, batch_format="pandas")
        .map_batches(rename, batch_format="pandas")
    )
    return pack_counts(counts, budget=budget, bucket_size=bucket_size, key=key)


def pack_counts(counts_ds, budget: int = 2048, bucket_size: int = 1000, key: str = "doc_id"):
    """Packing stages over a prepared (key, n_tokens) dataset — the
    two-level distributed prefix sum ``pack_sequences`` documents,
    reusable by composed pipelines that already computed token counts."""
    import ray

    def to_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key],
                "n_tokens": df["n_tokens"].astype("int64"),
                "bucket": (df[key] // bucket_size).astype("int64"),
            }
        )

    counts = counts_ds.map_batches(to_bucket, batch_format="pandas").materialize()

    from ray.data.aggregate import Sum

    subtotals = (
        counts.groupby("bucket").aggregate(Sum("n_tokens", alias_name="subtotal")).to_pandas()
    )
    subtotals = subtotals.sort_values("bucket", ignore_index=True)
    bases = dict(
        zip(
            subtotals["bucket"],
            subtotals["subtotal"].cumsum().shift(fill_value=0).astype("int64"),
        )
    )
    bases_ref = ray.put(bases)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref)[int(df["bucket"].iloc[0])]
        df = df.sort_values(key, ignore_index=True)
        cum_before = base + df["n_tokens"].cumsum().shift(fill_value=0).astype("int64")
        return pd.DataFrame(
            {
                key: df[key],
                "n_tokens": df["n_tokens"],
                "offset_tokens": cum_before,
                "pack_id": (cum_before // budget).astype("int64"),
            }
        )

    return counts.groupby("bucket").map_groups(assign, batch_format="pandas")


def vocab_overlap(ds, target_ds, key: str = "doc_id", text_col: str = "text"):
    """DSIR-style importance signal for data selection: the fraction of
    a document's tokens that appear in a target corpus's vocabulary
    (tokens of the benchmark / domain slice you want more of).

    Output per doc: ``(key, n_tokens, n_in_vocab, overlap)`` with
    ``overlap = n_in_vocab / n_tokens`` (0.0 for empty docs) — a ratio
    of small ints, so the float64 value is bit-identical to the SQL
    oracle's. Tokenization is the corpus-wide contract: lowercase,
    split on whitespace, empties dropped.

    Scale shape: the target vocabulary is assumed benchmark-sized
    (same assumption as ``decontaminate``'s shingle set); it is
    collected once, sorted, and broadcast via ``ray.put``, and each
    batch scores by one flattened ``np.searchsorted`` membership probe
    plus a per-doc segment sum — the corpus is never shuffled.
    """
    import numpy as np
    import ray

    def batch_vocab(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df[text_col]:
            toks.update((t or "").lower().split())
        return pd.DataFrame({"tok": sorted(toks)})

    parts = target_ds.map_batches(batch_vocab, batch_format="pandas").to_pandas()
    vocab = np.unique(parts["tok"].to_numpy(dtype=object)) if len(parts) else np.array([], dtype=object)
    ref = ray.put(vocab)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        v = ray.get(ref)
        token_lists = [(t or "").lower().split() for t in df[text_col]]
        lens = _np.fromiter((len(t) for t in token_lists), dtype=_np.int64, count=len(token_lists))
        total = int(lens.sum())
        if total == 0 or len(v) == 0:
            hits = _np.zeros(len(df), dtype=_np.int64)
        else:
            from itertools import chain

            flat = _np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
            idx = _np.searchsorted(v, flat)
            idx_c = _np.minimum(idx, len(v) - 1)
            member = (v[idx_c] == flat).astype(_np.int64)
            hits = _np.zeros(len(df), dtype=_np.int64)
            _np.add.at(hits, _np.repeat(_np.arange(len(lens)), lens), member)
        denom = lens.astype(_np.float64)
        overlap = _np.divide(hits, denom, out=_np.zeros(len(df)), where=lens > 0)
        return pd.DataFrame(
            {
                key: df[key].to_numpy(),
                "n_tokens": lens,
                "n_in_vocab": hits,
                "overlap": overlap,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def df_rarity(ds, key: str = "doc_id", text_col: str = "text"):
    """Corpus document-frequency scoring — the TF-IDF family's
    distributed shape, with exact-integer arithmetic so the score is
    bit-identical to the SQL oracle (no log/float accumulation).

    Per doc: ``(key, n_tokens, sum_df, mean_df)`` where ``df(tok)`` is
    the number of distinct documents containing ``tok``, ``sum_df``
    sums df over the doc's token OCCURRENCES (with multiplicity), and
    ``mean_df = sum_df / n_tokens`` (0.0 for empty docs) — low mean_df
    means rare vocabulary. Tokenization is the corpus-wide contract:
    lowercase, whitespace split, empties dropped.

    Scale shape (two passes, no corpus shuffle):

    1. DF pass: each batch emits one ``(tok, n_docs)`` partial from its
       rows' DISTINCT token sets (a doc is one row, so per-row distinct
       is exact); a groupby-Sum over vocab-sized partials yields the DF
       table.
    2. Score pass: the DF table is sorted and broadcast once via
       ``ray.put``; each batch maps all its token occurrences with ONE
       flattened ``np.searchsorted`` and segment-sums per doc.

    The broadcast assumes a boundable vocabulary (true after the usual
    normalization; at open-web scale cap the table to the top-V
    df-heaviest tokens, or swap the broadcast for a hash-partitioned
    token join — both seams are at the ``ray.put`` below)."""
    import numpy as np
    import ray

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df[text_col]:
            c.update(set((t or "").lower().split()))
        return pd.DataFrame({"tok": list(c.keys()), "n_docs": list(c.values())})

    parts = ds.map_batches(df_partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    df_tbl = parts.groupby("tok").aggregate(Sum("n_docs", alias_name="df")).to_pandas()
    order = np.argsort(df_tbl["tok"].to_numpy(dtype=object))
    vocab = df_tbl["tok"].to_numpy(dtype=object)[order]
    dfs = df_tbl["df"].to_numpy(dtype=np.int64)[order]
    ref = ray.put((vocab, dfs))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np
        from itertools import chain

        v, d = ray.get(ref)
        token_lists = [(t or "").lower().split() for t in df[text_col]]
        lens = _np.fromiter((len(t) for t in token_lists), dtype=_np.int64, count=len(token_lists))
        total = int(lens.sum())
        sums = _np.zeros(len(df), dtype=_np.int64)
        if total and len(v):
            flat = _np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
            idx = _np.searchsorted(v, flat)
            # every occurrence is in-vocab by construction (DF pass saw
            # the same corpus); the clamp only guards racing mutation
            idx = _np.minimum(idx, len(v) - 1)
            _np.add.at(sums, _np.repeat(_np.arange(len(lens)), lens), d[idx])
        mean_df = _np.divide(sums, lens, out=_np.zeros(len(df)), where=lens > 0)
        return pd.DataFrame(
            {
                key: df[key].to_numpy(),
                "n_tokens": lens,
                "sum_df": sums,
                "mean_df": mean_df,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def uniform_sample_n(ds, n: int = 100, key: str = "doc_id"):
    """Deterministic uniform sample of exactly ``n`` rows: the n
    smallest ``md5(str(key))`` values (ties broken by key) — the
    shuffle-free way to cut a fixed-size representative slice that is
    stable across runs, machines and engines, and composable with
    ``hash_split`` / ``stratified_sample`` (same hash contract).

    Scale shape: per-batch local top-n (sort + head), then ONE bounded
    merge task over n x blocks candidate rows — no global sort, the
    corpus is never shuffled. Matches ``ORDER BY md5(CAST(key AS
    VARCHAR)), key LIMIT n`` exactly."""

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {key: df[key], "h": [hashlib.md5(str(k).encode()).hexdigest() for k in df[key]]}
        )
        return out.sort_values(["h", key], kind="mergesort").head(n)

    partials = ds.map_batches(local_top, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["h", key], kind="mergesort").head(n).reset_index(drop=True)

    return partials.repartition(1).map_batches(merge, batch_size=None, batch_format="pandas")


def bernoulli_weighted(ds, scale: int = 512, key: str = "doc_id", text_col: str = "text"):
    """Deterministic weighted (quality-proportional) sampling: keep a
    document with probability ``min(1, n_tokens / scale)`` — longer
    docs kept more often — decided by a content-free coin
    ``u = uint32(md5(str(key))[:8]) / 2^32 < p``. The standard
    importance-sampling step when up/down-weighting corpus slices,
    stable across runs and engines like ``hash_split``.

    ``scale`` must be a power of two: then both ``u`` (a 32-bit integer
    over 2^32) and ``p`` (n / 2^k) are EXACT in float64, the comparison
    is bit-deterministic, and the SQL oracle reproduces it digit for
    digit. Per-batch vectorized token counts; one md5 per row (same
    string-work budget as fingerprinting); no shuffle, no state."""
    if scale & (scale - 1):
        raise ValueError("scale must be a power of two for exact float comparison")

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch[text_col].fillna("").str.split().str.len().astype("int64")
        u = (
            batch[key]
            .map(lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16))
            .astype("float64")
            / 4294967296.0
        )
        p = (n.astype("float64") / float(scale)).clip(upper=1.0)
        out = batch.loc[(u < p).to_numpy(), [key]].copy()
        out["n_tokens"] = n[(u < p).to_numpy()]
        return out

    return ds.map_batches(keep, batch_format="pandas")


def source_mix_balance(
    ds, group_col: str = "source", weight_col: str = "n_chars", key: str = "doc_id"
):
    """Deterministic source-mixture balancing (the Pile/Dolma mixing
    step): downsample every source to the smallest source's weight
    budget, so the kept corpus is (in expectation) weight-balanced
    across sources. Keep a row iff
    ``u = uint32(md5(str(key))[:8]) / 2^32  <  min_total / total_source``.

    Two streaming passes, neither shuffles the corpus: (1) per-batch
    partial (source, weight) sums fold into an n_sources-row table on
    the driver; (2) the tiny rate map broadcasts into a filter stage.
    The rate is one float64 division of two int64 totals — IEEE-
    deterministic, so the SQL oracle reproduces the decision bit for
    bit (same argument as ``bernoulli_weighted``)."""
    import ray

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False)[weight_col].sum()
        return g.rename(columns={weight_col: "w"})

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    totals = parts.groupby(group_col, as_index=False)["w"].sum()
    min_total = int(totals["w"].min()) if len(totals) else 0
    rates = {
        s: (float(min_total) / float(int(t)) if t else 0.0)
        for s, t in zip(totals[group_col], totals["w"])
    }
    rates_ref = ray.put(rates)

    class Keep:
        def __init__(self):
            self.rates = ray.get(rates_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            u = (
                df[key]
                .map(lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16))
                .astype("float64")
                / 4294967296.0
            )
            r = df[group_col].map(self.rates).fillna(0.0).astype("float64")
            mask = (u < r).to_numpy()
            return df.loc[mask, [key, group_col]]

    return ds.map_batches(Keep, batch_format="pandas", concurrency=2)


def temperature_mix(ds, group_col: str = "source", key: str = "doc_id"):
    """Temperature-flattened source mixing at exponent alpha = 1/2
    (temperature T = 2 — the standard multilingual-LM flattening step,
    XLM-R / mT5 style): target share q_s ~ p_s^(1/2), achieved by
    Bernoulli thinning with keep_prob_s = sqrt(n_min / n_s), so kept
    counts are ~ sqrt(n_min * n_s) and no source upsamples.

    EXACT integer decision (no float, no libm): with the 40-bit uniform
    ``u = uint40(md5(str(key))[:10])``, keep a row iff

        u * u * n_s  <  2^80 * n_min

    which is u/2^40 < sqrt(n_min/n_s) exactly. The engine evaluates the
    equivalent per-source threshold u <= isqrt((2^80*n_min - 1) // n_s)
    (integer square root on the driver, one per source) so the per-row
    compare stays vectorized int64; the oracle evaluates the product
    form in HUGEINT — bit-identical keep sets by construction. Other
    exponents need the float-threshold path (``source_mix_balance``'s
    shape); alpha=1/2 is the one with an exact integer witness.

    Two streaming passes, zero shuffles: (1) per-batch (source, count)
    partials fold into an n_sources-row table; (2) the tiny threshold
    map broadcasts into a filter stage. Returns (key, group_col, keep)
    for every row."""
    import math

    import ray

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    totals = parts.groupby(group_col, as_index=False)["n"].sum()
    if not len(totals):
        return ds.map_batches(
            lambda df: pd.DataFrame(
                {key: pd.Series(dtype="int64"), group_col: pd.Series(dtype=str), "keep": pd.Series(dtype=bool)}
            ),
            batch_format="pandas",
        )
    n_min = int(totals["n"].min())
    a = (1 << 80) * n_min
    thresholds = {
        s: math.isqrt((a - 1) // int(n)) for s, n in zip(totals[group_col], totals["n"])
    }
    thr_ref = ray.put(thresholds)

    class Keep:
        def __init__(self):
            self.thr = ray.get(thr_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            u = (
                df[key]
                .map(lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:10], 16))
                .to_numpy(dtype="int64")
            )
            t = df[group_col].map(self.thr).fillna(-1).astype("int64").to_numpy()
            return pd.DataFrame(
                {
                    key: np.asarray(df[key], dtype=np.int64),
                    group_col: df[group_col].to_numpy(),
                    "keep": u <= t,
                }
            )

    return ds.map_batches(Keep, batch_format="pandas", concurrency=2)


def source_tv_distance(ds, group_col: str = "source", text_col: str = "text", driver_cap: int = 5_000_000):
    """Data-mixing diagnostic: total-variation distance between each
    source's unigram token distribution and the whole-corpus
    distribution — TV(s) = 1/2 * sum_t |p_s(t) - p(t)|. High-TV sources
    are distribution outliers a mixture-weighting step (DoReMi-style)
    would re-weight; TV is chosen over KL because it needs no
    log/smoothing, so the score is EXACT-integer until one final
    division and hashes identically to the SQL oracle.

    Absent tokens are handled algebraically, not materialized: over a
    common denominator N_s*N the numerator is
    ``sum_{t in s} |c_st*N - c_t*N_s|  +  N_s * (N - sum_{t in s} c_t)``
    (the second term folds every token the source never uses), so the
    only tables are vocab-sized, never vocab x sources dense.

    Scale shape: ONE corpus pass emits per-batch (source, tok, c)
    partials -> groupby-Sum gives the (source, tok) count table; token
    totals and source totals derive from IT (bounded), never a second
    corpus pass. Token totals broadcast sorted via ``ray.put`` (same
    boundable-vocab seam as ``df_rarity``); per-source terms reduce via
    groupby-Sum; the final division runs over the source-count-sized
    table. Counts stay int64 — beyond ~10^9-token corpora the |c*N|
    products need the HUGEINT/object path (the oracle's SUM already
    widens); that swap is localized to ``terms`` below."""
    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    def counts_partial(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        token_lists = [(t or "").lower().split() for t in df[text_col]]
        lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
        total = int(lens.sum())
        if not total:
            return pd.DataFrame(
                {group_col: pd.Series(dtype=object), "tok": pd.Series(dtype=object), "c": pd.Series(dtype="int64")}
            )
        flat = np.fromiter(chain.from_iterable(token_lists), dtype=object, count=total)
        src = np.repeat(df[group_col].to_numpy(dtype=object), lens)
        # C-level hash groupby — no per-token Python
        out = (
            pd.DataFrame({group_col: src, "tok": flat})
            .groupby([group_col, "tok"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "c"})
        )
        out["c"] = out["c"].astype("int64")
        return out

    # dual-path reduce: the whole algebra below runs over the (source,
    # tok) count table — when that table is driver-small (<= cap rows
    # after compaction), stream the partials down and run the identical
    # integer math locally, skipping four distributed exchanges' fixed
    # machinery. Web-scale vocabularies overflow the cap and take the
    # distributed path unchanged.
    import ray.data as _raydata

    cap = driver_cap
    frames: list | None = []
    buffered = 0

    def compact(fr):
        return (
            pd.concat(fr, ignore_index=True)
            .groupby([group_col, "tok"], as_index=False, sort=False)["c"]
            .sum()
        )

    for b in ds.map_batches(counts_partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        if not len(b):
            continue
        frames.append(b[[group_col, "tok", "c"]])
        buffered += len(b)
        if buffered > cap:
            comp = compact(frames)
            if len(comp) > cap:
                frames = None
                break
            frames, buffered = [comp], len(comp)
    if frames is not None:
        if not frames:
            return _raydata.from_pandas(
                pd.DataFrame({group_col: pd.Series(dtype=object), "n_tokens": pd.Series(dtype="int64"), "tv": pd.Series(dtype="float64")})
            )
        cst_df = compact(frames)
        cst_df["c"] = cst_df["c"].astype("int64")
        ct = cst_df.groupby("tok", sort=False)["c"].transform("sum").to_numpy(dtype=np.int64)
        ns_by_src = cst_df.groupby(group_col, sort=False)["c"].sum().astype("int64")
        big_n = int(cst_df["c"].sum())
        ns = cst_df[group_col].map(ns_by_src).to_numpy(dtype=np.int64)
        c = cst_df["c"].to_numpy(dtype=np.int64)
        num = np.abs(c * big_n - ct * ns)
        agg = pd.DataFrame({group_col: cst_df[group_col], "num": num, "ctsum": ct}).groupby(
            group_col, as_index=False, sort=False
        ).sum()
        ns_v = agg[group_col].map(ns_by_src).to_numpy(dtype=np.int64)
        total_num = agg["num"].to_numpy(dtype=np.int64) + ns_v * (
            big_n - agg["ctsum"].to_numpy(dtype=np.int64)
        )
        tv = total_num.astype("float64") / (2.0 * ns_v.astype("float64") * float(big_n))
        out = pd.DataFrame({group_col: agg[group_col], "n_tokens": ns_v, "tv": tv}).sort_values(
            group_col, ignore_index=True
        )
        return _raydata.from_pandas(out)

    cst = (
        ds.map_batches(counts_partial, batch_format="pandas")
        .groupby([group_col, "tok"])
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    # token + source totals derive from the bounded count table
    ct_tbl = cst.groupby("tok").aggregate(Sum("c", alias_name="ct")).to_pandas()
    order = np.argsort(ct_tbl["tok"].to_numpy(dtype=object))
    vocab = ct_tbl["tok"].to_numpy(dtype=object)[order]
    cts = ct_tbl["ct"].to_numpy(dtype=np.int64)[order]
    big_n = int(cts.sum())
    ns_tbl = cst.groupby(group_col).aggregate(Sum("c", alias_name="ns")).to_pandas()
    ns_map = dict(zip(ns_tbl[group_col], ns_tbl["ns"].astype("int64")))
    ref = ray.put((vocab, cts))

    def terms(df: pd.DataFrame) -> pd.DataFrame:
        vocab_, cts_ = ray.get(ref)
        idx = np.searchsorted(vocab_, df["tok"].to_numpy(dtype=object))
        ct = cts_[idx]
        ns = df[group_col].map(ns_map).to_numpy(dtype=np.int64)
        c = df["c"].to_numpy(dtype=np.int64)
        num = np.abs(c * big_n - ct * ns)
        out = pd.DataFrame({group_col: df[group_col], "num": num, "ctsum": ct})
        return out.groupby(group_col, as_index=False).sum()

    reduced = (
        cst.map_batches(terms, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("num", alias_name="num"), Sum("ctsum", alias_name="ctsum"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ns = df[group_col].map(ns_map).to_numpy(dtype=np.int64)
        num = df["num"].to_numpy(dtype=np.int64) + ns * (big_n - df["ctsum"].to_numpy(dtype=np.int64))
        tv = num.astype("float64") / (2.0 * ns.astype("float64") * float(big_n))
        out = pd.DataFrame({group_col: df[group_col], "n_tokens": ns, "tv": tv})
        return out.sort_values(group_col, ignore_index=True)

    return reduced.repartition(1).map_batches(finish, batch_size=None, batch_format="pandas")


def dsir_weights(
    ds,
    key: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
    n_buckets: int = 4096,
):
    """DSIR importance weighting (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log-likelihood ratio of its hashed n-gram features under a
    target-distribution model vs the raw-corpus model —
    ``logw(d) = sum_{f in feats(d)} [ ln((c_p(b_f)+1)/(N_p+B)) -
    ln((c_q(b_f)+1)/(N_q+B)) ]`` where features are unigrams + adjacent
    bigrams of the lowercased whitespace tokens, ``b_f = md5(f)[:8] mod
    B`` buckets them (the paper's hashed n-gram generative model), the
    target counts ``c_p`` come from rows with ``target_col ==
    target_val`` and the source counts ``c_q`` from the whole corpus.
    High ``logw`` = the document looks like the target domain;
    importance resampling then keeps docs with Gumbel-perturbed top-k
    logw (the resample step is ``bernoulli_weighted``'s shape and is
    left to the caller so this operator stays deterministic).

    Output: one row per document, ``(key, n_feats, logw)``; empty
    documents score 0.0.

    Scale shape (two passes, corpus never shuffled): per-batch hashed
    bucket partials -> groupby-Sum over a table bounded by B x batches
    -> ONE dense float64 log-ratio array of FIXED size B (32 KB at
    B=4096) broadcast via ``ray.put`` -> per-batch vectorized probe +
    segment-sum. Unlike vocab-broadcast scorers (``df_rarity``,
    ``lm_perplexity``) the broadcast here is O(B) regardless of corpus
    size — this is the operator shape that holds unchanged at 100 TB."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def _feat_lists(texts) -> list[list[str]]:
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            out.append(toks + [a + " " + b for a, b in zip(toks, toks[1:])])
        return out

    def _buckets(flat: np.ndarray) -> np.ndarray:
        # md5 hex prefix -> uint32 mod B: the SQL-reproducible hash
        # (same trick as split_threshold_hex / samp_uniform_n); md5 runs
        # once per DISTINCT feature in the batch, not per occurrence
        uniq, inv = np.unique(flat, return_inverse=True)
        ub = np.fromiter(
            (
                int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8], 16) % n_buckets
                for u in uniq
            ),
            dtype=np.int64,
            count=len(uniq),
        )
        return ub[inv]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        feats = _feat_lists(df[text_col])
        lens = np.fromiter((len(f) for f in feats), dtype=np.int64, count=len(feats))
        total = int(lens.sum())
        if not total:
            return pd.DataFrame(
                {"b": pd.Series(dtype="int64"), "nt": pd.Series(dtype="int64"), "ns": pd.Series(dtype="int64")}
            )
        flat = np.fromiter(chain.from_iterable(feats), dtype=object, count=total)
        b = _buckets(flat)
        is_t = np.repeat((df[target_col].to_numpy(dtype=object) == target_val), lens)
        ns = np.bincount(b, minlength=n_buckets)
        nt = np.bincount(b[is_t], minlength=n_buckets)
        nz = ns > 0
        return pd.DataFrame(
            {"b": np.flatnonzero(nz), "nt": nt[nz].astype("int64"), "ns": ns[nz].astype("int64")}
        )

    cnt = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("b")
        .aggregate(Sum("nt", alias_name="nt"), Sum("ns", alias_name="ns"))
        .to_pandas()
    )
    nt_d = np.zeros(n_buckets, dtype=np.int64)
    ns_d = np.zeros(n_buckets, dtype=np.int64)
    if len(cnt):
        nt_d[cnt["b"].to_numpy(dtype=np.int64)] = cnt["nt"].to_numpy(dtype=np.int64)
        ns_d[cnt["b"].to_numpy(dtype=np.int64)] = cnt["ns"].to_numpy(dtype=np.int64)
    n_p, n_q = int(nt_d.sum()), int(ns_d.sum())
    lr = np.log((nt_d + 1.0) / (n_p + n_buckets)) - np.log((ns_d + 1.0) / (n_q + n_buckets))
    ref = ray.put(lr)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from itertools import chain

        lr_ = ray.get(ref)
        feats = _feat_lists(df[text_col])
        lens = np.fromiter((len(f) for f in feats), dtype=np.int64, count=len(feats))
        total = int(lens.sum())
        logw = np.zeros(len(df), dtype=np.float64)
        if total:
            flat = np.fromiter(chain.from_iterable(feats), dtype=object, count=total)
            contrib = lr_[_buckets(flat)]
            np.add.at(logw, np.repeat(np.arange(len(lens)), lens), contrib)
        return pd.DataFrame({key: df[key].to_numpy(), "n_feats": lens, "logw": logw})

    return ds.map_batches(score, batch_format="pandas")


def domain_cap(
    ds,
    cap_chars: int = 6000,
    key: str = "doc_id",
    group_col: str = "source",
    size_col: str = "n_chars",
    num_partitions: int | None = None,
):
    """Per-domain corpus budget cap (RefinedWeb-style: no single domain
    may contribute more than a fixed budget to the corpus): within each
    ``group_col`` group, keep documents in deterministic
    ``(md5(key), key)`` order while the running ``size_col`` total stays
    <= ``cap_chars`` — i.e. ``SUM(size) OVER (PARTITION BY group ORDER
    BY md5(key), key ROWS UNBOUNDED PRECEDING) <= cap``. The md5 order
    makes the kept subset a stable uniform slice of each domain (same
    coin as ``hash_split``), independent of ingest order.

    Output: the kept ``(key, group_col, size_col)`` rows — exact row
    set, hash-identical to the SQL oracle.

    Scale shape: metadata-only read (3 narrow columns, never the text);
    ONE hash exchange co-partitions domains, then the cap is a
    vectorized sort + grouped cumsum per partition. Skew seam: a
    mega-domain is one group task here; beyond single-task size, split
    the domain into md5-prefix buckets, prefix-sum bucket subtotals on
    the driver, and apply per-bucket base offsets — ``pack_sequences``'
    two-level shape, applied per domain."""
    import numpy as np

    from gleaner_ray.cluster import cluster_cpus

    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(s).encode()).digest()[:8], "big")
                for s in df[group_col]
            ),
            dtype=np.uint64,
            count=len(df),
        )
        return df.assign(pid=(h % np.uint64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        coin = df[key].astype(str).map(lambda s: hashlib.md5(s.encode()).hexdigest())
        df = df.assign(_coin=coin).sort_values(
            [group_col, "_coin", key], kind="mergesort", ignore_index=True
        )
        cum = df.groupby(group_col, sort=False)[size_col].cumsum().astype("int64")
        keep = df.loc[cum.to_numpy() <= cap_chars, [key, group_col, size_col]]
        return keep.reset_index(drop=True)

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def epoch_plan(ds, budget: int = 1_000_000, weights: dict | None = None):
    """Mixture/epoch budgeting (the LLaMA-style sampling table): given
    per-source mixture weights and a global token budget, compute each
    source's token target and its epoch factor (how many passes over
    the source the target implies — >1 means oversampling/repeats,
    <1 means subsampling).

    target_s = Hamilton largest-remainder share of ``budget`` by weight
    (exact integers, sums to the budget bit-for-bit; remainder ties
    break source-ascending); epochs_s = target_s / n_tokens_s as one
    float64 division.

    ``weights`` defaults to the board's deterministic stand-in
    ``1 + (trailing_digits(source) % 5)`` so the plan is reproducible
    from the data alone; production passes the curated mixture table.

    Scale shape: ONE streaming pass folds per-source token counts into
    the bounded source table (``fold_reduce`` dual path); the
    apportionment is driver arithmetic over that table — the corpus is
    never shuffled.  Output: (source, n_tokens, weight, target_tokens,
    epochs), source-sorted.
    """
    import re as _re

    from ray.data.aggregate import Sum

    from .fold import fold_or_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.split().str.len().astype("int64")
        return (
            pd.DataFrame({"source": df["source"], "n_tokens": n})
            .groupby("source", as_index=False)["n_tokens"]
            .sum()
        )

    parts = ds.map_batches(partial, batch_format="pandas")
    folded, mat = fold_or_reduce(parts, ["source"], {"n_tokens": "sum"})
    if folded is None:  # pragma: no cover - >5M sources
        folded = mat.groupby("source").aggregate(Sum("n_tokens", alias_name="n_tokens")).to_pandas()
    tab = folded.sort_values("source", ignore_index=True)
    n = len(tab)
    if n == 0:
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_tokens": pd.Series(dtype="int64"),
                "weight": pd.Series(dtype="int64"),
                "target_tokens": pd.Series(dtype="int64"),
                "epochs": pd.Series(dtype="float64"),
            }
        )
    if weights is None:
        def _w(s: str) -> int:
            m = _re.search(r"([0-9]+)$", s)
            return 1 + (int(m.group(1)) % 5 if m else 0)

        w = np.array([_w(s) for s in tab["source"]], dtype=np.int64)
    else:
        w = np.array([int(weights[s]) for s in tab["source"]], dtype=np.int64)
    total_w = int(w.sum())
    base = (int(budget) * w) // total_w
    rem = (int(budget) * w) % total_w
    leftover = int(budget) - int(base.sum())
    order = np.argsort(-rem, kind="stable")  # ties: source asc (pre-sorted)
    bonus = np.zeros(n, dtype=np.int64)
    bonus[order[:leftover]] = 1
    target = base + bonus
    nt = tab["n_tokens"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "source": tab["source"],
            "n_tokens": nt,
            "weight": w,
            "target_tokens": target,
            "epochs": target.astype(np.float64) / np.maximum(nt, 1).astype(np.float64),
        }
    )


def shuffle_positions(ds, key: str = "doc_id"):
    """Deterministic global training shuffle: assigns every row its
    position in the md5-ordering of the corpus — ``row_number() OVER
    (ORDER BY md5(str(key)), key)`` — without a global sort.

    Training runs shuffle the corpus once per epoch; doing it as an
    all-to-all payload sort at 100 TB is the single most expensive step
    in naive pipelines. Here only positions move: (1) each batch
    reduces to per-bucket counts (bucket = first md5 byte, 256 rows max
    per batch — corpus-size-independent); (2) the driver prefix-sums
    the bounded bucket table into base offsets; (3) ONE bucket-keyed
    exchange co-locates each bucket, which sorts locally and assigns
    ``base + arange`` — exact global positions. Readers then stream
    ``sort by (bucket, h)``-partitioned output in position order, or
    join positions back to the payload on the key (key-width exchange).
    Same two-level prefix-sum seam as ``pack_sequences`` /
    ``global_rank_events``; at 10^12 rows widen to 2-byte buckets so a
    bucket stays one group task."""
    import ray
    from ray.data.aggregate import Sum

    def with_hash(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(k).encode()).hexdigest() for k in df[key]]
        return pd.DataFrame(
            {
                key: df[key],
                "h": h,
                "bucket": np.fromiter((int(x[:2], 16) for x in h), dtype="int64", count=len(h)),
            }
        )

    hashed = ds.map_batches(with_hash, batch_format="pandas")

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bucket", as_index=False).agg(n=("bucket", "size"))
        out["n"] = out["n"].astype("int64")
        return out

    tbl = (
        hashed.map_batches(bucket_counts, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    base = {int(b): int(v) for b, v in zip(tbl["bucket"], tbl["n"].cumsum() - tbl["n"])}
    base_ref = ray.put(base)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        df = df.sort_values(["h", key], kind="mergesort", ignore_index=True)
        pos = bases[int(df["bucket"].iloc[0])] + np.arange(1, len(df) + 1, dtype="int64")
        return pd.DataFrame({key: df[key], "pos": pos})

    return hashed.groupby("bucket").map_groups(rank_bucket, batch_format="pandas")


def group_sample_n(ds, n: int = 20, group: str = "source", key: str = "doc_id"):
    """Per-group deterministic uniform sample of exactly ``n`` rows —
    ``row_number() OVER (PARTITION BY group ORDER BY md5(str(key)),
    key) <= n`` — the per-source slice cut (eval slices, per-domain
    spot-checks) on the same hash contract as ``uniform_sample_n``.

    Scale shape: per-batch local top-n per group (one vectorized sort +
    grouped head), then ONE bounded merge over n x groups x blocks
    candidate rows — no shuffle of the corpus, no window exchange.
    Bounded-groups assumption: the merge table must fit one task (n x
    |groups|); for unbounded group domains co-partition by group and
    take heads per partition instead."""

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                group: df[group],
                key: df[key],
                "h": [hashlib.md5(str(k).encode()).hexdigest() for k in df[key]],
            }
        )
        out = out.sort_values(["h", key], kind="mergesort")
        return out.groupby(group, as_index=False, sort=False).head(n)

    partials = ds.map_batches(local_top, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", key], kind="mergesort")
        out = df.groupby(group, as_index=False, sort=False).head(n)
        return out[[group, key]].sort_values([group, key], ignore_index=True)

    return partials.repartition(1).map_batches(merge, batch_size=None, batch_format="pandas")


def rank_by_key(ds, key: str, tiebreak: str | None = None, prefix_len: int = 2):
    """Exact global 1-based rank of every row in ``(key, tiebreak)``
    order — ``row_number() OVER (ORDER BY key, tiebreak)`` — without a
    global payload sort.

    The order-preserving sibling of ``shuffle_positions``: buckets are
    the key's first ``prefix_len`` characters (lexicographic prefix, so
    bucket order IS key order), counted per batch into a bounded
    (prefix, n) table; the driver prefix-sums it in sorted-prefix order
    and ONE prefix-keyed exchange sorts each bucket locally and assigns
    ``base + arange``. Only (key, tiebreak) columns ever move.

    Skew note: prefix buckets inherit the key distribution (a corpus
    where every SURT starts ``com,`` piles into one bucket) — raise
    ``prefix_len`` until the largest bucket fits one group task; the
    bucket-count pass reports exact sizes, so the split is observable
    before the exchange runs.  Publishing a sorted artifact (CDX,
    terasort-style output) then writes each bucket's rows at its rank
    range — payload never moves through an all-to-all."""
    import ray
    from ray.data.aggregate import Sum

    cols = [key] + ([tiebreak] if tiebreak else [])
    order = cols if tiebreak else [key]

    def with_prefix(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["_pfx"] = df[key].astype(str).str[:prefix_len]
        return out

    keyed = ds.map_batches(with_prefix, batch_format="pandas")

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("_pfx", as_index=False).agg(n=("_pfx", "size"))
        out["n"] = out["n"].astype("int64")
        return out

    tbl = (
        keyed.map_batches(counts, batch_format="pandas")
        .groupby("_pfx")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("_pfx", ignore_index=True)
    )
    base = {p: int(v) for p, v in zip(tbl["_pfx"], tbl["n"].cumsum() - tbl["n"])}
    base_ref = ray.put(base)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        df = df.sort_values(order, kind="mergesort", ignore_index=True)
        pos = bases[str(df["_pfx"].iloc[0])] + np.arange(1, len(df) + 1, dtype="int64")
        out = df[cols].copy()
        out["pos"] = pos
        return out

    return keyed.groupby("_pfx").map_groups(rank_bucket, batch_format="pandas")


def interleave_order(ds, group: str = "source", key: str = "doc_id"):
    """Deterministic round-robin interleave order across sources — the
    mixture-scheduling sibling of :func:`shuffle_positions`: training
    wants sources evenly spread through an epoch, not merely globally
    shuffled (a md5 shuffle leaves runs; round-robin bounds the gap
    between consecutive docs of one source to the source count).

    rr_pos = (rank_within_source − 1) · n_sources + source_index is a
    total order key: sorting by it visits sources round-robin, each
    source in its own md5 order. Same two-level prefix-sum seam as
    ``shuffle_positions`` with (source, bucket) buckets — only
    positions move, the corpus never payload-sorts. At 10^12 rows
    widen to 2-byte buckets so one (source, bucket) cell stays a
    single group task."""
    import ray
    from ray.data.aggregate import Sum

    def with_hash(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(k).encode()).hexdigest() for k in df[key]]
        return pd.DataFrame(
            {
                key: df[key],
                group: df[group],
                "h": h,
                "bucket": np.fromiter((int(x[:2], 16) for x in h), dtype="int64", count=len(h)),
            }
        )

    hashed = ds.map_batches(with_hash, batch_format="pandas")

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([group, "bucket"], as_index=False).agg(n=("bucket", "size"))
        out["n"] = out["n"].astype("int64")
        return out

    tbl = (
        hashed.map_batches(bucket_counts, batch_format="pandas")
        .groupby([group, "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values([group, "bucket"], ignore_index=True)
    )
    tbl["base"] = (tbl.groupby(group)["n"].cumsum() - tbl["n"]).astype("int64")
    base = {(s, int(b)): int(v) for s, b, v in zip(tbl[group], tbl["bucket"], tbl["base"])}
    sources = sorted(tbl[group].unique().tolist())
    sidx = {s: i for i, s in enumerate(sources)}
    n_sources = len(sources)
    state = ray.put((base, sidx, n_sources))

    def rank_bucket(df: pd.DataFrame, _st=state) -> pd.DataFrame:
        bases, si, ns = ray.get(_st)
        df = df.sort_values(["h", key], kind="mergesort", ignore_index=True)
        s = df[group].iloc[0]
        rs = bases[(s, int(df["bucket"].iloc[0]))] + np.arange(1, len(df) + 1, dtype="int64")
        return pd.DataFrame(
            {
                key: df[key],
                group: df[group],
                "rs": rs,
                "rr_pos": (rs - 1) * np.int64(ns) + np.int64(si[s]),
            }
        )

    return hashed.groupby([group, "bucket"]).map_groups(rank_bucket, batch_format="pandas")


def kfold_assign(ds, k: int = 4, key: str = "doc_id"):
    """Deterministic k-fold cross-validation assignment: fold =
    (first md5 hex digit of the key) mod k — uniform when 16 % k == 0
    (use 2/4/8/16), content-free (the ``hash_split`` coin contract), and
    reproducible from the key alone on any engine. Row-local, zero
    exchange; the held-out fold i is ``fold == i``, train is the rest."""
    if 16 % k != 0:
        raise ValueError("k must divide 16 for an exactly uniform hex-digit fold")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        folds = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[0], 16) % k for v in df[key]),
            dtype=np.int64,
            count=len(df),
        )
        return pd.DataFrame({key: df[key], "fold": folds})

    return ds.map_batches(fn, batch_format="pandas")
