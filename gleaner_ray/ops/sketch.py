"""Distributed mergeable sketches: HyperLogLog cardinality and
Misra-Gries heavy hitters.

``approx_distinct`` answers COUNT(DISTINCT col) over a 10^10-row
frontier without ever shuffling keys: each block folds its values into
<= 2**p (register, rho) partial rows, one bounded groupby-Max merges
the registers, and the driver turns the 2**p-row register table into
the estimate.  The exchanged data is O(2**p x blocks) regardless of
input size — the shape exact ``unique``/``groupby`` distinct cannot
avoid.

No ``oracle_sql`` board entry: a deterministic approximation cannot
hash-match exact SQL.  Correctness is pinned instead by
bounded-relative-error tests against DuckDB's exact COUNT(DISTINCT)
at two scales, and by merge-invariance (re-blocking the input must
not change the estimate — register max-merge is associative and
commutative).

Reference relationship: the reference engine has no cardinality
sketch; this is one of the beyond-reference training-data ops
(distinct-URL / distinct-domain accounting at crawl scale).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = [
    "approx_distinct",
    "approx_distinct_by",
    "heavy_hitters_exact",
    "hll_estimate",
    "topk_heavy_hitters",
]


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (exact integer math —
    float log2 misranks values near powers of two above 2**53)."""
    x = w.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - s))
        n[mask] += s
        x[mask] <<= np.uint64(s)
    n[w == 0] = 64
    return n


def _register_partial(df: pd.DataFrame, col: str, p: int) -> pd.DataFrame:
    """One block -> its nonzero HLL registers as (reg, rho) rows."""
    regs = _block_registers(df[col].to_numpy(), p)
    nz = np.nonzero(regs)[0]
    return pd.DataFrame({"reg": nz.astype(np.int64), "rho": regs[nz]})


def hll_estimate(registers: np.ndarray) -> float:
    """Fold a dense register array (len 2**p) into the HLL estimate,
    with the standard small-range linear-counting correction."""
    m = len(registers)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-registers.astype(np.float64))))
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e


def approx_distinct_by(ds, group_col: str, col: str, p: int = 12) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT ``col``) per ``group_col`` group —
    the shape "distinct URLs per domain" takes at crawl scale.

    Each block emits its nonzero (group, reg, rho) rows (<= groups x
    2**p, in practice far fewer); one groupby-Max merges them; the
    bounded merged table folds into one estimate row per group on the
    driver.  The raw table is never shuffled — only register rows
    move.  Returns a DataFrame (group_col, approx_distinct) sorted by
    group."""
    from ray.data.aggregate import Max

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in df.groupby(group_col, sort=False):
            regs = _register_partial(sub, col, p)
            regs.insert(0, group_col, g)
            outs.append(regs)
        if not outs:
            return pd.DataFrame(
                {group_col: [], "reg": np.array([], dtype=np.int64), "rho": np.array([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([group_col, "reg"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()  # bounded: groups x 2**p register rows
    )
    m = 1 << p
    rows = []
    for g, sub in merged.groupby(group_col, sort=True):
        registers = np.zeros(m, dtype=np.int64)
        registers[sub["reg"].to_numpy()] = sub["rho"].to_numpy()
        rows.append({group_col: g, "approx_distinct": hll_estimate(registers)})
    return pd.DataFrame(rows)


def _block_registers(vals: np.ndarray, p: int) -> np.ndarray:
    """Dense HLL register array (len 2**p, int64) for one value block."""
    regs = np.zeros(1 << p, dtype=np.int64)
    if len(vals) == 0:
        return regs
    h = pd.util.hash_array(vals).astype(np.uint64)  # stable 64-bit, C-vectorized
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = np.minimum(_clz64(w) + 1, 64 - p + 1)
    np.maximum.at(regs, idx, rho)
    return regs


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT ``col``) via HyperLogLog (2**p
    registers; p=12 -> ~1.6% standard error, 4 KiB of sketch state).

    One custom global aggregate: each block folds into a dense 2**p
    register vector (vectorized), vectors max-merge pairwise in Ray's
    aggregate tree — NO hash shuffle at all, 2**p ints per block on
    the wire.  (The earlier groupby('reg')-Max formulation paid the
    hash-exchange fixed cost for a 4096-row table; measured 12.8 s ->
    ~1 s at sf0.01.)"""
    from ray.data.aggregate import AggregateFn

    fn = AggregateFn(
        init=lambda k: np.zeros(1 << p, dtype=np.int64),
        merge=np.maximum,
        accumulate_block=lambda acc, block: np.maximum(
            acc, _block_registers(block[col].to_numpy(), p)
        ),
        finalize=hll_estimate,
        name="hll",
    )
    res = ds.aggregate(fn)
    return res["hll"] if res else 0.0


def _mg_truncate(counts: dict, capacity: int) -> dict:
    """Misra-Gries decrement step: keep <= capacity keys by subtracting
    the (capacity+1)-th largest count from every key and dropping
    non-positives.  Each call preserves the MG invariant
    true_count - N/capacity <= stored <= true_count."""
    if len(counts) <= capacity:
        return counts
    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # (capacity+1)-th largest = pivot to subtract
    d = int(np.partition(vals, len(vals) - capacity - 1)[len(vals) - capacity - 1])
    return {k: c - d for k, c in counts.items() if c > d}


def _mg_merge(a: dict, b: dict, capacity: int) -> dict:
    out = dict(a)
    for k, c in b.items():
        out[k] = out.get(k, 0) + c
    return _mg_truncate(out, capacity)


def heavy_hitters_exact(ds, col: str, capacity: int = 128):
    """All values with true frequency > N/capacity, with EXACT counts —
    the sketch-then-verify composition (same contract as the LSH
    recall-1 dedup family): a mergeable Misra-Gries pass finds a
    candidate SUPERSET in <= ``capacity`` counters per aggregate leaf
    (every value with freq > N/capacity is guaranteed to survive any
    merge order), then one partial-count pass over only the candidate
    set verifies exactly.  Equivalent to SQL
    ``GROUP BY col HAVING count(*) * capacity > N`` but without ever
    shuffling the full key space: the wide step groups <= capacity
    candidate keys, and the corpus itself is never exchanged.

    Returns a Dataset of (col, cnt:int64).  Integer threshold compare
    (cnt * capacity > N) keeps engine and oracle bit-identical."""
    from ray.data.aggregate import AggregateFn, Sum

    import ray as _ray

    def accumulate(acc, block):
        counts, n = acc
        vals = block[col]
        arr = vals.to_numpy() if hasattr(vals, "to_numpy") else np.asarray(vals)
        vc = pd.Series(arr).value_counts()
        return (
            _mg_merge(counts, {key: int(c) for key, c in vc.items()}, capacity),
            n + len(arr),
        )

    fn = AggregateFn(
        init=lambda _: ({}, 0),
        merge=lambda a, b: (_mg_merge(a[0], b[0], capacity), a[1] + b[1]),
        accumulate_block=accumulate,
        finalize=lambda acc: acc,
        name="mg",
    )
    res = ds.aggregate(fn)
    counts, n_total = res["mg"] if res else ({}, 0)
    if not counts:
        import ray.data as _rd

        return _rd.from_pandas(
            pd.DataFrame({col: pd.Series([], dtype="int64"),
                          "cnt": pd.Series([], dtype="int64")})
        )
    cand_ref = _ray.put(set(counts))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col]
        vc = s[s.isin(_ray.get(cand_ref))].value_counts()
        return pd.DataFrame(
            {col: vc.index.to_numpy(), "cnt": vc.to_numpy().astype("int64")}
        )

    exact = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(col)
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    thr = int(n_total)
    return exact.map_batches(
        lambda df: df[df["cnt"] * capacity > thr], batch_format="pandas"
    )


def topk_heavy_hitters(ds, col: str, k: int = 10, capacity: int = 256) -> pd.DataFrame:
    """Approximate top-k most frequent values via a mergeable
    Misra-Gries summary (Agarwal et al., "Mergeable Summaries") — the
    unbounded-vocabulary complement to the exact partial-combine
    ``text.ngram_top_k``: state is <= ``capacity`` counters per
    aggregate leaf no matter how many distinct values stream by.

    Guarantees (any merge order): every value with true frequency
    > N/capacity survives, and true - N/capacity <= est <= true.
    Deterministic top-k therefore needs the k-th/(k+1)-th true counts
    separated by more than N/capacity — size ``capacity`` accordingly
    (tests pin both bounds).  Returns (value, est_count) sorted by
    est_count desc, value asc."""
    from ray.data.aggregate import AggregateFn

    def accumulate(acc: dict, block) -> dict:
        vals = block[col]
        vc = pd.Series(vals.to_numpy() if hasattr(vals, "to_numpy") else np.asarray(vals)).value_counts()
        return _mg_merge(acc, {key: int(n) for key, n in vc.items()}, capacity)

    fn = AggregateFn(
        init=lambda _: {},
        merge=lambda a, b: _mg_merge(a, b, capacity),
        accumulate_block=accumulate,
        finalize=lambda acc: acc,
        name="mg",
    )
    res = ds.aggregate(fn)
    counts = res["mg"] if res else {}
    out = pd.DataFrame({"value": list(counts.keys()), "est_count": list(counts.values())})
    return out.sort_values(["est_count", "value"], ascending=[False, True], ignore_index=True).head(k)
