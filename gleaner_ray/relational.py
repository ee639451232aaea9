"""Relational operator library over the TPC-H-ish test tables.

The crawl pipeline needs only a handful of relational shapes (broadcast
semi-join, groupby dedup); this module fills out the general-purpose
surface a user of the engine gets, each op oracle-checkable in ANSI SQL:

- ``filter_project``   — pruned read + vectorized predicate
- ``grouped_agg``      — partial per-batch combine, then small groupby
- ``broadcast_join``   — small side via ray.put, lookup per batch
- ``hash_join``        — both sides large: Dataset.join (hash shuffle)
- ``semi_join`` / ``anti_join`` — EXISTS / NOT EXISTS shapes; the right
  side ships distinct keys only (per-block dedupe before the exchange)
- ``topk``             — per-batch top-k, merge (no global sort)
- ``distinct``         — hash groupby
- ``tumbling_window``  — event-time windows as key-bucket groupby
- ``asof_join``        — per-key pd.merge_asof inside map_groups (an
  operator Ray Data lacks; partitioning assumption: rows of one key fit
  one group — salt wide keys upstream if not)
- ``quantiles``        — exact distributed quantiles via value counts
  (bounded domain; sketch seam documented for unbounded)
- ``sessionize``       — gap-based session windows, co-partitioned by
  key, vectorized island assignment per partition
- ``grouped_topk``     — row_number()<=k parity without a global sort
- ``range_join``       — interval self-join via co-partition + composite
  monotone key + searchsorted window bounds (no per-key Python)
- ``rollup_agg`` / ``cube_agg`` — GROUP BY ROLLUP / CUBE from
  finest-grain partials (all grouping sets from one bounded table)
- ``pivot``            — conditional aggregate (COUNT FILTER parity)
- ``lag_delta``        — LAG window fn, exact integer-µs gaps
- ``running_total``    — cumulative window frame (row_number + running
  sum), co-partitioned by key, exact integer arithmetic
- ``string_agg``       — ordered per-group concatenation (string_agg /
  group_concat parity)
- ``left/full outer join`` — misses survive; right side pre-filtered /
  left side pre-aggregated before the exchange
- ``union_distinct``   — UNION parity via per-block key dedupe +
  Dataset.union + key-only groupby
- ``moving_sum``       — bounded window frame (ROWS BETWEEN k PRECEDING
  AND CURRENT ROW), grouped cumsum/shift subtract
- ``global_rank``      — global ORDER BY row_number + NTILE via bounded
  bucket counts + driver prefix-sum (no global payload sort)
- ``corr``             — Pearson correlation per group from exact int64
  moment sums (one identical float expression both engines)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from gleaner_ray.cluster import cluster_cpus

__all__ = [
    "filter_project",
    "grouped_agg_q1",
    "broadcast_join_orders_customers",
    "hash_join_lineitem_orders",
    "semi_join_customers_events",
    "anti_join_customers_events",
    "topk_orders",
    "distinct_segments",
    "tumbling_window_events",
    "sliding_window_events",
    "distinct_users_per_type",
    "asof_join_events_orders",
    "quantiles_lineitem",
    "quantiles_unbounded",
    "outliers_events",
    "dense_rank_events",
    "stream_window_events",
    "percent_rank_events",
    "sessionize_events",
    "grouped_topk_orders",
    "ntile_events",
    "range_join_events",
    "rollup_agg_lineitem",
    "pivot_events",
    "lag_delta_events",
    "cube_agg_lineitem",
    "running_total_events",
    "string_agg_orders",
    "left_outer_join_customers_orders",
    "full_outer_join_users_customers",
    "union_distinct_ids",
    "moving_sum_events",
    "global_rank_events",
    "corr_value_hour_by_type",
    "grouping_sets_agg_lineitem",
    "intersect_ids",
    "except_ids",
    "json_extract_events",
    "lead_delta_events",
    "first_last_value_events",
    "time_range_sum_events",
    "skew_join_events_customers",
    "mode_segment_by_nation",
    "q3_shipping",
    "above_order_avg_lineitems",
    "regr_value_on_hour",
]


def filter_project(sf_dir: str):
    """lineitem rows shipped before 1996-01-01: pruned columns, vectorized
    predicate, computed revenue column."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01")))
        t = t.filter(mask)
        revenue = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", revenue)

    return ds.map_batches(fn, batch_format="pyarrow")


def grouped_agg_q1(sf_dir: str):
    """TPC-H Q1 shape with the partial-aggregate pattern: one combine row
    per (flag, status) per batch, then a tiny global groupby."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # integer micro-units so partial sums are order-independent and
        # bit-exact vs the SQL oracle: price in cents, discount in percent
        price_cents = (df.l_extendedprice * 100).round().astype("int64")
        disc_pct = (df.l_discount * 100).round().astype("int64")
        df = df.assign(
            qty_i=df.l_quantity.round().astype("int64"),
            price_cents=price_cents,
            revenue_micros=price_cents * (100 - disc_pct),
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty_i", "sum"),
            sum_base_price_cents=("price_cents", "sum"),
            revenue_micros=("revenue_micros", "sum"),
            count_order=("qty_i", "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
        Sum("revenue_micros", alias_name="revenue_micros"),
        Sum("count_order", alias_name="count_order"),
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def broadcast_join_orders_customers(sf_dir: str):
    """orders ⨝ customer on custkey — the small side broadcast once.

    The customer table travels via ``ray.put`` ONCE (Arrow tables
    deserialize zero-copy from plasma); each batch is joined against it
    with pyarrow's hash join (Acero, C++) — no per-row Python work on
    the large side."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    cust_ref = ray.put(cust)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    class Join:
        def __init__(self):
            self.cust = ray.get(cust_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            # inner join: misses drop, left columns then right payload
            # columns — same output schema as the previous row-wise path
            return t.join(
                self.cust, keys=["o_custkey"], right_keys=["c_custkey"], join_type="inner"
            )

    return orders.map_batches(Join, batch_format="pyarrow", concurrency=2)


def _join_partitions(sf_dir: str, table: str, minimum: int = 8) -> int:
    """Data-aware shuffle width: scales with the cluster but is capped
    by the big side's row count (parquet metadata, no read) — Ray's
    hash shuffle pays a fixed per-partition aggregator cost, so 32
    partitions on a 600k-row table is ~2x pure overhead (measured)."""
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows
    return max(minimum, min(cluster_cpus(minimum), max(2, n_rows // 50_000)))


def hash_join_lineitem_orders(sf_dir: str, num_partitions: int | None = None):
    """Both sides large -> Ray Data's hash-partitioned join on the key."""
    if num_partitions is None:
        num_partitions = _join_partitions(sf_dir, "lineitem")
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_custkey"])
    joined = lineitem.join(
        orders, join_type="inner", num_partitions=num_partitions, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    return joined


def _event_userkeys(sf_dir: str):
    """Distinct user_id per input block — shrinks the semi/anti join's
    shuffled right side to unique keys per block before the exchange."""

    def local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(ignore_index=True)

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]).map_batches(
        local_distinct, batch_format="pandas"
    )


def semi_join_customers_events(sf_dir: str, num_partitions: int | None = None):
    """Customers with >=1 event (active users): hash-partitioned LEFT
    SEMI join.

    SQL: ``WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id =
    c.c_custkey)``.  A semi join never multiplies rows, so the output is
    bounded by the left side regardless of event fan-out."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"])
    return cust.join(
        _event_userkeys(sf_dir),
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("user_id",),
    )


def anti_join_customers_events(sf_dir: str, num_partitions: int | None = None):
    """Customers with NO events (inactive users): hash-partitioned LEFT
    ANTI join (``WHERE NOT EXISTS`` in SQL)."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"])
    return cust.join(
        _event_userkeys(sf_dir),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("user_id",),
    )


def topk_orders(sf_dir: str, k: int = 10):
    """Top-k orders by totalprice: per-batch top-k then tiny merge —
    no global sort shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nlargest(k, ["o_totalprice", "o_orderkey"])

    partials = ds.map_batches(local_topk, batch_format="pandas")
    # final merge: k rows per block -> one bounded task (k x n_blocks
    # rows total); returned as a Dataset for API consistency
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.nlargest(k, ["o_totalprice", "o_orderkey"])
            .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True], ignore_index=True)
        )

    return partials.repartition(1).map_batches(merge, batch_size=None, batch_format="pandas")


def distinct_segments(sf_dir: str):
    """distinct c_mktsegment — hash groupby (small key domain)."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    return ds.groupby("c_mktsegment").count().sort("c_mktsegment")


def tumbling_window_events(sf_dir: str, window_s: int = 300):
    """5-minute tumbling windows per event_type: floor(epoch/size) bucket
    + groupby — the streaming-window analogue for a batch log."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        win = (df["ts"].astype("int64") // 1_000_000 // window_s) * window_s
        g = df.assign(window_start=pd.to_datetime(win, unit="s")).groupby(
            ["event_type", "window_start"], as_index=False
        )
        return g.agg(n=("value", "size"))

    partials = ds.map_batches(bucket, batch_format="pandas")
    # final reduce: the result cardinality is bounded (windows x types),
    # so a single-task pandas groupby over the small partials beats the
    # distributed sort-aggregate by an order of magnitude at this size;
    # for unbounded window domains switch to groupby().aggregate(Sum)
    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "window_start"], as_index=False).agg(n=("n", "sum"))
        return out.sort_values(["event_type", "window_start"], ignore_index=True)

    return partials.repartition(1).map_batches(final, batch_size=None, batch_format="pandas")


def sliding_window_events(sf_dir: str, width_s: int = 600, slide_s: int = 300):
    """Sliding (hopping) window counts per event_type: each event lands
    in ``width/slide`` overlapping windows. The per-batch expansion is a
    vectorized repeat/tile (k copies per row, k = width//slide — no
    per-row Python), pre-aggregated locally before the bounded final
    reduce, so the exchanged volume is windows x types, not events x k."""
    if width_s % slide_s:
        raise ValueError("width_s must be a multiple of slide_s")
    k = width_s // slide_s
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        epoch = (df["ts"].astype("int64") // 1_000_000).to_numpy()
        base = (epoch // slide_s) * slide_s
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_s, len(df)
        )
        out = pd.DataFrame(
            {
                "event_type": np.repeat(df["event_type"].to_numpy(), k),
                "window_start": pd.to_datetime(starts, unit="s"),
            }
        )
        g = out.groupby(["event_type", "window_start"], as_index=False)
        return g.agg(n=("window_start", "size"))

    partials = ds.map_batches(bucket, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "window_start"], as_index=False).agg(n=("n", "sum"))
        return out.sort_values(["event_type", "window_start"], ignore_index=True)

    # bounded final reduce, same rationale as tumbling_window_events
    return partials.repartition(1).map_batches(final, batch_size=None, batch_format="pandas")


def distinct_users_per_type(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type — the distinct-aggregate.

    Two-level: local per-batch pair dedupe (shrinks the exchange to the
    distinct pairs each block holds), ONE hash groupby on the pair to
    finish global dedupe, then a bounded per-type count (the pair table
    leaving the shuffle is already unique, so the final count is a
    small-partials reduce like the window ops)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(ignore_index=True)

    pairs = (
        ds.map_batches(local, batch_format="pandas")
        .groupby(["event_type", "user_id"])
        .count()
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(n_users=("user_id", "size"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).agg(n_users=("n_users", "sum"))
        out["n_users"] = out["n_users"].astype("int64")
        return out.sort_values("event_type", ignore_index=True)

    partials = pairs.map_batches(partial, batch_format="pandas")
    return partials.repartition(1).map_batches(final, batch_size=None, batch_format="pandas")


def asof_join_events_orders(sf_dir: str, num_partitions: int | None = None):
    """For each event, the user's most recent order at event time.

    Custom operator Ray Data lacks: CO-PARTITION both sides by hash of
    the key (union with a side tag + keyed repartition — one exchange,
    no broadcast of either table), then ONE vectorized
    ``pd.merge_asof(by=key)`` per partition over the time-sorted block.
    Partitioning assumption: all rows of one key fit in one partition
    (salt by time range upstream for pathological keys). Matches DuckDB
    ASOF JOIN with the right side made unique on (key, time) — ties on
    o_orderdate collapse to the max o_orderkey, since ASOF's pick among
    equal timestamps is otherwise arbitrary on both engines."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "t": df["ts"],
                "event_id": df["event_id"].astype("Int64"),
                "o_orderkey": pd.array([pd.NA] * len(df), dtype="Int64"),
                "is_left": True,
            }
        )

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["o_custkey"].astype("int64"),
                "t": df["o_orderdate"],
                "event_id": pd.array([pd.NA] * len(df), dtype="Int64"),
                "o_orderkey": df["o_orderkey"].astype("Int64"),
                "is_left": False,
            }
        )

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        # bounded partition id: all rows of a key land in one group and
        # the group count is num_partitions (not the key cardinality),
        # so the per-group Python overhead is amortized over large groups
        df = df.copy()
        df["pid"] = (df["user_id"] % np.int64(num_partitions)).astype("int64")
        return df

    both = (
        events.map_batches(tag_left, batch_format="pandas")
        .union(orders.map_batches(tag_right, batch_format="pandas"))
        .map_batches(add_pid, batch_format="pandas")
    )

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["is_left"]].sort_values("t", kind="mergesort")
        # deterministic tie-break: one row per (key, time), max orderkey
        right = (
            df[~df["is_left"]]
            .groupby(["user_id", "t"], as_index=False)["o_orderkey"]
            .max()
            .sort_values("t", kind="mergesort")
        )
        left = pd.DataFrame(
            {"event_id": left["event_id"].astype("int64"), "user_id": left["user_id"], "ts": left["t"]}
        )
        right = pd.DataFrame(
            {"user_id": right["user_id"], "o_orderdate": right["t"], "o_orderkey": right["o_orderkey"]}
        )
        if left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "o_orderkey": pd.array([], dtype="Int64"),
                    "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                }
            )
        out = pd.merge_asof(
            left, right, by="user_id", left_on="ts", right_on="o_orderdate", direction="backward"
        )
        # plain int64 when fully matched (nullable Int64 only if the left
        # join actually produced gaps) — mirrors DuckDB's fetch typing
        k = out["o_orderkey"]
        out["o_orderkey"] = k.astype("int64") if not k.isna().any() else k.astype("Int64")
        return out[["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"]]

    return both.groupby("pid").map_groups(per_partition, batch_format="pandas")


def quantiles_lineitem(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.95)):
    """Exact distributed quantiles of l_quantity per l_returnflag.

    Scale shape: quantiles over a BOUNDED value domain reduce to value
    counts — one vectorized (group, value)-count per batch, a tiny
    groupby-sum of the partials (cardinality = groups x distinct values,
    independent of row count), then cumsum + rank pick in one bounded
    task. No sort shuffle, no sample-based approximation. For unbounded
    domains swap the count table for a mergeable sketch at the same
    seams. Rank semantics match SQL quantile_disc: smallest value whose
    cumulative count reaches ceil(q*n)."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(qty=df["l_quantity"].round().astype("int64"))
        return df.groupby(["l_returnflag", "qty"], as_index=False).agg(n=("qty", "size"))

    partials = ds.map_batches(counts, batch_format="pandas")
    from ray.data.aggregate import Sum

    merged = partials.groupby(["l_returnflag", "qty"]).aggregate(Sum("n", alias_name="n"))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, g in df.groupby("l_returnflag"):
            g = g.sort_values("qty")
            cum = g["n"].cumsum()
            total = int(cum.iloc[-1])
            row = {"l_returnflag": flag}
            for q in qs:
                rank = max(1, int(np.ceil(q * total)))
                row["p%02d" % round(q * 100)] = int(g["qty"][cum >= rank].iloc[0])
            rows.append(row)
        return pd.DataFrame(rows).sort_values("l_returnflag", ignore_index=True)

    # final pick: input is the bounded count table (flags x ~50 values)
    return merged.repartition(1).map_batches(pick, batch_size=None, batch_format="pandas")


def sessionize_events(sf_dir: str, gap_s: int = 1800, num_partitions: int | None = None):
    """Gap-based session windows per user (30-min inactivity closes a
    session): one hash exchange co-partitions users, then sessions are
    assigned fully vectorized inside each partition (sort + cumsum of
    gap breaks — no per-user Python). Session boundaries are invariant
    to tie order at equal timestamps, so the result is deterministic."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = df["ts"].diff().dt.total_seconds()
        brk = (new_user | (gap > gap_s)).astype("int64")
        df = df.assign(sid=brk.cumsum())
        out = df.groupby(["user_id", "sid"], as_index=False).agg(
            session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size")
        )
        return out[["user_id", "session_start", "session_end", "n_events"]]

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def range_join_events(sf_dir: str, window_s: int = 3600, num_partitions: int | None = None):
    """Interval (range) self-join: all pairs of events by the same user
    where the second strictly follows the first within ``window_s``
    seconds — the attribution-window shape
    ``b.user_id = a.user_id AND b.ts > a.ts AND b.ts <= a.ts + W``.

    Custom operator Ray Data lacks: ONE hash exchange co-partitions
    users, then each partition answers every interval query fully
    vectorized — rows sorted once by a composite monotone key
    ``user_rank * span + ts_us`` (span exceeds the partition's time
    range plus the window, so a window probe can never cross into the
    next user's segment), window bounds from two ``np.searchsorted``
    calls over the whole partition, and pair expansion via
    repeat/arange. No per-row or per-user Python.

    Partitioning assumptions (documented for 100-TB use): one user's
    events fit a partition (salt by coarse time bucket upstream for
    pathological users), and ``users_per_partition * (time_range + W)``
    microseconds fits int64 — with daily time-bucketing that holds for
    any realistic partition; the composite-key build asserts it.
    Output size is sum over rows of their window occupancy — bound it
    by choosing W, exactly as in the SQL it mirrors."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    window_us = np.int64(window_s) * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "src_event": pd.Series([], dtype="int64"),
                "dst_event": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "src_ts": pd.Series([], dtype="datetime64[us]"),
                "dst_ts": pd.Series([], dtype="datetime64[us]"),
            }
        )
        if df.empty:
            return empty
        df = df.sort_values(["user_id", "ts"], kind="mergesort", ignore_index=True)
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")
        off = ts_us - ts_us.min()
        span = np.int64(off.max()) + window_us + 2
        codes = pd.factorize(df["user_id"].to_numpy())[0].astype("int64")  # nondecreasing
        if codes[-1] > 0 and span > np.iinfo(np.int64).max // (codes[-1] + 1):
            raise OverflowError(
                "range_join_events: partition composite key exceeds int64; "
                "salt users by coarse time bucket upstream"
            )
        key = codes * span + off
        lo = np.searchsorted(key, key, side="right")  # first strictly-later same-user row
        hi = np.searchsorted(key, key + window_us, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        src = np.repeat(np.arange(len(df), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        dst = np.repeat(lo, counts) + (np.arange(total, dtype=np.int64) - np.repeat(starts, counts))
        ev = df["event_id"].to_numpy(dtype="int64")
        uid = df["user_id"].to_numpy(dtype="int64")
        ts = df["ts"].to_numpy(dtype="datetime64[us]")
        return pd.DataFrame(
            {
                "src_event": ev[src],
                "dst_event": ev[dst],
                "user_id": uid[src],
                "src_ts": ts[src],
                "dst_ts": ts[dst],
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def _grouping_sets_lineitem(sf_dir: str, sets: tuple[tuple[str, ...], ...]):
    """Shared plan for multi-grouping-set aggregates (ROLLUP / CUBE):
    partials at the FINEST grain per batch (one combine row per
    (flag, status) per batch), a tiny groupby-sum exchange, then every
    coarser grouping set derived from the finest table in one bounded
    task whose input cardinality is the group count, independent of row
    count. NULL marks a grouped-out column, matching SQL output."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )
    keys = ["l_returnflag", "l_linestatus"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(qty_i=df["l_quantity"].round().astype("int64"))
        return df.groupby(keys, as_index=False).agg(sum_qty=("qty_i", "sum"), n=("qty_i", "size"))

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    finest = partials.groupby(keys).aggregate(
        Sum("sum_qty", alias_name="sum_qty"), Sum("n", alias_name="n")
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        cols = keys + ["sum_qty", "n"]
        frames = []
        for gs in sets:
            if tuple(gs) == tuple(keys):
                frames.append(df[cols])
                continue
            if gs:
                lvl = df.groupby(list(gs), as_index=False).agg(
                    sum_qty=("sum_qty", "sum"), n=("n", "sum")
                )
            else:
                lvl = pd.DataFrame({"sum_qty": [df["sum_qty"].sum()], "n": [df["n"].sum()]})
            for k in keys:
                if k not in gs:
                    lvl[k] = None
            frames.append(lvl[cols])
        out = pd.concat(frames, ignore_index=True)
        for k in keys:
            out[k] = out[k].astype(object)
        return out

    return finest.repartition(1).map_batches(expand, batch_size=None, batch_format="pandas")


def rollup_agg_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): the hierarchical
    grouping sets — finest, per-flag, grand total."""
    return _grouping_sets_lineitem(
        sf_dir, (("l_returnflag", "l_linestatus"), ("l_returnflag",), ())
    )


def cube_agg_lineitem(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus): all 2^2 grouping sets,
    adding the per-status margin to ROLLUP's three levels."""
    return _grouping_sets_lineitem(
        sf_dir,
        (("l_returnflag", "l_linestatus"), ("l_returnflag",), ("l_linestatus",), ()),
    )


def grouped_topk_orders(sf_dir: str, k: int = 3):
    """Top-k orders by totalprice PER o_orderpriority (window-function
    row_number() <= k parity): per-batch grouped top-k keeps partials
    bounded at k x groups x blocks, then one bounded merge task — no
    global sort, no full-column shuffle."""
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderkey", "o_totalprice"]
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
        )
        return df.groupby("o_orderpriority", as_index=False).head(k)

    partials = ds.map_batches(local_topk, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
        )
        return df.groupby("o_orderpriority", as_index=False).head(k).reset_index(drop=True)

    return partials.repartition(1).map_batches(merge, batch_size=None, batch_format="pandas")


def pivot_events(sf_dir: str, categories: tuple[str, ...] = ("click", "view", "purchase", "signup", "error")):
    """Pivot / one-hot conditional aggregate: per user, one count column
    per event type (``COUNT(*) FILTER (WHERE ...)`` parity). The column
    set is declared up front — as SQL PIVOT requires — so each batch
    reduces to a fixed-width partial (users x len(categories) ints) and
    the only exchange is a groupby-Sum over partials."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    cols = {c: f"n_{c}" for c in categories}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": df["user_id"].unique()}).set_index("user_id")
        g = df.groupby(["user_id", "event_type"]).size()
        for c, name in cols.items():
            s = g.xs(c, level="event_type") if c in g.index.get_level_values(1) else None
            out[name] = s.reindex(out.index, fill_value=0) if s is not None else 0
            out[name] = out[name].astype("int64")
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    from ray.data.aggregate import Sum

    return partials.groupby("user_id").aggregate(
        *[Sum(name, alias_name=name) for name in cols.values()]
    )


def lag_delta_events(sf_dir: str, num_partitions: int | None = None):
    """LAG window function: per event, the gap to the same user's
    previous event in exact integer microseconds (-1 sentinel for a
    user's first event) — ``coalesce(date_diff('microsecond', lag(ts)
    OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), -1)``
    parity, with the deterministic (ts, event_id) tie order sessionize
    uses. The sentinel (gaps are >= 0) keeps the column non-null
    int64 on both engines: a NULL here turns DuckDB's fetchdf into
    float64 and breaks the driver's exact value hash.

    One hash exchange co-partitions users; within a partition the lag
    and diff are a vectorized sort + shift + subtract, with user
    boundaries masked to the sentinel. Integer microseconds avoid the
    float-seconds epoch division, so values hash bit-identical."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")
        gap = ts_us - np.roll(ts_us, 1)
        new_user = df["user_id"].ne(df["user_id"].shift()).to_numpy()
        gap[new_user] = -1
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"],
                "gap_us": gap,
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def running_total_events(sf_dir: str, num_partitions: int | None = None):
    """Cumulative window frame per user: ``row_number()`` and a running
    sum of event value over ``(PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING)``.

    Same scale shape as lag/sessionize: ONE hash exchange co-partitions
    users, then both window functions are a vectorized sort + grouped
    cumcount/cumsum inside each partition — no per-user Python, no
    global sort. The running sum accumulates exact integer cents
    (``floor(value*100)``) so the result is independent of both
    engines' float-summation order and hashes bit-identical."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        cents = pd.Series(np.floor(df["value"].to_numpy() * 100.0).astype("int64"))
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"],
                "rn": (g.cumcount() + 1).astype("int64"),
                "cum_cents": cents.groupby(df["user_id"], sort=False).cumsum().astype("int64"),
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def string_agg_orders(sf_dir: str, num_partitions: int | None = None):
    """Ordered per-group concatenation: per customer, order statuses
    joined with ',' in ``(o_orderdate, o_orderkey)`` order plus the
    group size — ``string_agg(x, ',' ORDER BY ...)`` / group_concat
    parity.

    One hash exchange co-partitions customers; inside a partition one
    mergesort puts every group in emit order and the concatenation is a
    single pandas groupby-agg over contiguous runs. Output is one row
    per group, so the exchanged and returned volume is bounded by group
    count x string budget — at corpus scale, cap the per-group length
    upstream (LIMIT inside the group) exactly as SQL users do."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"],
    )

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["o_custkey"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        out = df.groupby("o_custkey", sort=False, as_index=False).agg(
            n_orders=("o_orderstatus", "size"), statuses=("o_orderstatus", ",".join)
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def left_outer_join_customers_orders(sf_dir: str, num_partitions: int | None = None):
    """LEFT OUTER join: every customer, joined to their URGENT orders,
    with NULL order columns for customers that have none — the
    enrichment-join shape where the left side must survive misses.

    Ray Data's hash-partitioned ``join(join_type="left_outer")`` —
    both sides exchange once on the key; the right side is pre-filtered
    BEFORE the shuffle so only joining rows move."""
    if num_partitions is None:
        num_partitions = _join_partitions(sf_dir, "orders")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    )

    def urgent(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))).drop_columns(
            ["o_orderpriority"]
        )

    joined = cust.join(
        orders.map_batches(urgent, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return joined.select_columns(["c_custkey", "c_name", "o_orderkey", "o_totalprice"])


def full_outer_join_users_customers(sf_dir: str, num_partitions: int | None = None):
    """FULL OUTER join: per-user event counts against the customer
    table — rows survive from BOTH sides (users with no customer row,
    customers with no events). The left side is pre-aggregated to one
    row per key before the exchange (partial combine per batch, then
    groupby-Sum), so the join moves counts, not events."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    from ray.data.aggregate import Sum

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(n_events=("user_id", "size"))
        out["n_events"] = out["n_events"].astype("int64")
        return out

    per_user = (
        events.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    return per_user.join(
        cust,
        join_type="full_outer",
        num_partitions=num_partitions,
        on=("user_id",),
        right_on=("c_custkey",),
    )


def union_distinct_ids(sf_dir: str):
    """Distinct set union across tables: every id appearing as an event
    user or an order customer — ``UNION`` (distinct) parity via
    ``Dataset.union`` + one key-only groupby. Each input is projected
    to the bare key column and deduped per batch BEFORE the union, so
    the exchange carries distinct keys per block, not raw rows."""

    def ukeys(path: str, col: str):
        ds = rd.read_parquet(path, columns=[col])

        def distinct(t: pa.Table) -> pa.Table:
            arr = pc.unique(t[col])
            return pa.table({"id": arr})

        return ds.map_batches(distinct, batch_format="pyarrow")

    u = ukeys(f"{sf_dir}/events.parquet", "user_id").union(
        ukeys(f"{sf_dir}/orders.parquet", "o_custkey")
    )
    return u.groupby("id").count().select_columns(["id"])


def moving_sum_events(sf_dir: str, window_rows: int = 3, num_partitions: int | None = None):
    """Bounded window frame: per user, the sum of event value over the
    current row and the ``window_rows`` preceding rows —
    ``SUM(...) OVER (... ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)``
    parity.

    Same co-partitioned shape as running_total; the bounded frame is
    two vectorized passes (grouped cumsum, grouped shift, subtract) —
    no rolling-window Python loop. Exact integer cents, so the sum is
    float-order independent and hashes bit-identical."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        cents = pd.Series(np.floor(df["value"].to_numpy() * 100.0).astype("int64"))
        g = cents.groupby(df["user_id"], sort=False)
        cum = g.cumsum()
        lagged = cum.groupby(df["user_id"], sort=False).shift(window_rows + 1)
        moving = (cum - lagged.fillna(0)).astype("int64")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"],
                "moving_cents": moving,
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def global_rank_events(sf_dir: str, ntiles: int = 4):
    """Global ORDER BY rank + NTILE without a global sort:
    ``row_number() OVER (ORDER BY ts, event_id)`` and ``ntile(n)`` over
    the whole table.

    Two-level prefix-sum (same seam as sequence packing): (1) each
    batch reduces to per-day-bucket counts — a bounded (bucket, n)
    table independent of row count; (2) the driver prefix-sums that
    tiny table into per-bucket base offsets; (3) one exchange
    co-locates each day bucket, which sorts locally and assigns
    ``base + arange`` — exact global ranks, no all-to-all sort of the
    payload. NTILE derives arithmetically from the rank and total
    (first ``total % n`` tiles take the extra row, SQL semantics).

    Partitioning assumption: one day bucket fits one group task — at
    10^10 rows pick a finer bucket (hour/minute) so the bucket table
    stays driver-sized; the documented tree-prefix-sum seam applies
    beyond."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["ts"].to_numpy(dtype="datetime64[us]").view("int64") // 86_400_000_000).astype(
            "int64"
        )
        out = pd.DataFrame({"bucket": b}).groupby("bucket", as_index=False).agg(n=("bucket", "size"))
        out["n"] = out["n"].astype("int64")
        return out

    tbl = (
        ds.map_batches(bucket_counts, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    total = int(tbl["n"].sum())
    base = {int(b): int(v) for b, v in zip(tbl["bucket"], tbl["n"].cumsum() - tbl["n"])}
    base_ref = ray.put(base)
    q, r = divmod(total, ntiles)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["ts"].to_numpy(dtype="datetime64[us]").view("int64") // 86_400_000_000).astype(
            "int64"
        )
        return df.assign(bucket=b)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        df = df.sort_values(["ts", "event_id"], kind="mergesort", ignore_index=True)
        rank = bases[int(df["bucket"].iloc[0])] + np.arange(1, len(df) + 1, dtype="int64")
        # SQL NTILE: the first (total % n) tiles take ceil(total/n) rows
        big = np.int64(r) * (q + 1)
        tile = np.where(
            rank <= big,
            (rank - 1) // (q + 1) + 1,
            r + (rank - big - 1) // max(q, 1) + 1,
        ).astype("int64")
        return pd.DataFrame(
            {"event_id": df["event_id"].astype("int64"), "rank": rank, "quartile": tile}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def corr_value_hour_by_type(sf_dir: str):
    """Pearson correlation per group — ``corr(x, y) GROUP BY
    event_type`` parity between event value (exact integer cents) and
    hour-of-day.

    Numeric-stability-by-exactness: each batch reduces to EXACT int64
    moment sums (n, Sx, Sy, Sxy, Sxx, Syy) — order-independent, so the
    partial-aggregate exchange is a 6-column groupby-Sum — and the
    final correlation is ONE float expression evaluated identically
    here and in the SQL oracle (every total cast to double first, then
    mul/sub/sqrt in the same order; IEEE ops are exactly rounded, so
    the doubles hash bit-identical). Int64 bound: |cents| <= 10^5 and
    hour <= 23 keep Sxx below 2^63 up to ~10^12 rows; shard the moment
    sums by key-salt beyond."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df["value"].to_numpy() * 100.0).astype("int64")
        y = df["ts"].dt.hour.to_numpy().astype("int64")
        t = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        return t.groupby("event_type", as_index=False).sum()

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            *[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype("float64")
        sx = df["sx"].astype("float64")
        sy = df["sy"].astype("float64")
        num = n * df["sxy"].astype("float64") - sx * sy
        den = np.sqrt(n * df["sxx"].astype("float64") - sx * sx) * np.sqrt(
            n * df["syy"].astype("float64") - sy * sy
        )
        return pd.DataFrame({"event_type": df["event_type"], "corr_cents_hour": num / den})

    # finish runs on the bounded totals table (one row per event type)
    return totals.map_batches(finish, batch_format="pandas")


def grouping_sets_agg_lineitem(sf_dir: str):
    """Arbitrary GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)):
    the non-hierarchical case ROLLUP/CUBE can't express — both margins,
    neither the finest grain nor the grand total. Reuses the shared
    finest-grain-partials plan: all requested sets still derive from
    ONE bounded (flag, status) table, so adding sets costs no extra
    pass over the data."""
    return _grouping_sets_lineitem(sf_dir, (("l_returnflag",), ("l_linestatus",)))


def intersect_ids(sf_dir: str):
    """Distinct set intersection (INTERSECT parity): ids appearing BOTH
    as an event user and an order customer. Per-block key dedupe on
    each side, then Ray's left_semi hash join over distinct keys — the
    exchange carries keys only."""
    num_partitions = max(8, cluster_cpus(8))

    def ukeys(path: str, col: str):
        ds = rd.read_parquet(path, columns=[col])

        def distinct(t: pa.Table) -> pa.Table:
            return pa.table({"id": pc.unique(t[col])})

        # one groupby collapses per-block distincts to global distincts
        return ds.map_batches(distinct, batch_format="pyarrow").groupby("id").count().select_columns(["id"])

    left = ukeys(f"{sf_dir}/events.parquet", "user_id")
    right = ukeys(f"{sf_dir}/orders.parquet", "o_custkey")
    return left.join(
        right.map_batches(lambda t: t.rename_columns(["rid"]), batch_format="pyarrow"),
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("id",),
        right_on=("rid",),
    )


def except_ids(sf_dir: str):
    """Distinct set difference (EXCEPT parity): order customers with NO
    events — same keys-only plan as intersect with a left_anti join."""
    num_partitions = max(8, cluster_cpus(8))

    def ukeys(path: str, col: str, out: str):
        ds = rd.read_parquet(path, columns=[col])

        def distinct(t: pa.Table) -> pa.Table:
            return pa.table({out: pc.unique(t[col])})

        return ds.map_batches(distinct, batch_format="pyarrow").groupby(out).count().select_columns([out])

    left = ukeys(f"{sf_dir}/orders.parquet", "o_custkey", "id")
    right = ukeys(f"{sf_dir}/events.parquet", "user_id", "rid")
    return left.join(
        right, join_type="left_anti", num_partitions=num_partitions, on=("id",), right_on=("rid",)
    )


def json_extract_events(sf_dir: str, field: str = "k"):
    """Per-row JSON field extraction from the ``props`` sidecar column
    (``json_extract(props, '$.k')`` parity) — the
    semi-structured-payload shape every crawl/event table carries.

    Vectorized analytic fast path + exact fallback, the same pattern as
    the crawl fixups: one compiled-regex ``str.extract`` handles the
    canonical single-field form at C speed; rows it cannot prove are
    re-parsed with ``json.loads`` (the authoritative semantics), so the
    fast path can never change a result, only skip work. Missing field
    or null/invalid JSON -> NULL, as in SQL. Pure map — no shuffle, no
    state."""
    import json
    import re

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    # canonical '{"k": 123}' (single field, int value) — anchored so any
    # extra structure falls through to the JSON parser
    pat = re.compile(r'^\{"%s":\s*(-?\d+)\}$' % re.escape(field))

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        props = df["props"]
        fast = props.str.extract(pat, expand=False)
        need_slow = fast.isna() & props.notna()
        if need_slow.any():
            def slow(s):
                try:
                    v = json.loads(s).get(field)
                except (ValueError, AttributeError):
                    return None
                return v if isinstance(v, int) else None

            fast = fast.where(~need_slow, props[need_slow].map(slow))
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "k": pd.array(fast, dtype="Int64"),
            }
        )

    return ds.map_batches(extract, batch_format="pandas")


def lead_delta_events(sf_dir: str, num_partitions: int | None = None):
    """LEAD window function: per event, the gap to the same user's NEXT
    event in exact integer microseconds (-1 sentinel for a user's last
    event) — the forward complement of ``lag_delta_events``, same
    co-partitioned vectorized shape (sort + reverse shift + subtract,
    user boundaries masked to the sentinel; see lag_delta_events for
    why the sentinel beats NULL for driver-hash parity)."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")
        gap = np.roll(ts_us, -1) - ts_us
        last_of_user = df["user_id"].ne(df["user_id"].shift(-1)).to_numpy()
        gap[last_of_user] = -1
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"],
                "gap_next_us": gap,
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def first_last_value_events(sf_dir: str, num_partitions: int | None = None):
    """FIRST_VALUE / LAST_VALUE per group over ``(ts, event_id)`` order:
    each user's earliest and latest event value — the ordered-aggregate
    shape (``arg_min`` / ``arg_max`` by a composite order key).

    Two-level ordered reduction, the same seam as grouped_topk: each
    batch keeps only its per-user first and last candidate rows (2
    rows per user per block — bounded, payload-free), then ONE narrow
    exchange co-partitions users and the winner is re-picked
    vectorized. The raw table is never shuffled."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        out = pd.concat([g.head(1), g.tail(1)], ignore_index=True)
        return out.assign(pid=(out["user_id"] % np.int64(num_partitions)).astype("int64"))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        first = g.head(1).set_index("user_id")["value"]
        last = g.tail(1).set_index("user_id")["value"]
        return pd.DataFrame(
            {
                "user_id": first.index.to_numpy(dtype="int64"),
                "first_value": first.to_numpy(),
                "last_value": last.to_numpy(),
            }
        )

    return (
        ds.map_batches(candidates, batch_format="pandas")
        .groupby("pid")
        .map_groups(pick, batch_format="pandas")
    )


def time_range_sum_events(sf_dir: str, window_s: int = 3600, num_partitions: int | None = None):
    """Time-based RANGE window frame: per event, the sum of event value
    over the same user's events in ``[ts - window, ts]`` —
    ``SUM(...) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN
    INTERVAL ... PRECEDING AND CURRENT ROW)`` parity, INCLUDING peer
    rows at the same timestamp (SQL RANGE semantics).

    The value-based frame Ray Data lacks: one hash exchange
    co-partitions users, then each partition answers every frame from
    TWO searchsorted calls over a composite monotone key (user_rank *
    span + ts_us, the range_join construction — a bound can never
    cross a user boundary) and a global exact-cents prefix sum:
    ``win[i] = P[hi-1] - P[lo-1]``. No per-row loop; peers share a key
    so side='right' bounds include them."""
    if num_partitions is None:
        num_partitions = max(8, cluster_cpus(8))
    window_us = np.int64(window_s) * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pid=(df["user_id"] % np.int64(num_partitions)).astype("int64"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")
        off = ts_us - ts_us.min()
        span = np.int64(off.max()) + window_us + 2
        codes = pd.factorize(df["user_id"].to_numpy())[0].astype("int64")
        if codes[-1] > 0 and span > np.iinfo(np.int64).max // (codes[-1] + 1):
            raise OverflowError(
                "time_range_sum_events: composite key exceeds int64; "
                "salt users by coarse time bucket upstream"
            )
        key = codes * span + off
        cents = np.floor(df["value"].to_numpy() * 100.0).astype("int64")
        prefix = np.concatenate(([0], np.cumsum(cents)))  # P[i] = sum of cents[:i]
        lo = np.searchsorted(key, key - window_us, side="left")
        hi = np.searchsorted(key, key, side="right")  # includes peers
        win = prefix[hi] - prefix[lo]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"],
                "range_cents": win.astype("int64"),
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def skew_join_events_customers(
    sf_dir: str, hot_factor: float = 4.0, num_partitions: int | None = None
):
    """events ⨝ customer with hot-key salting — the join shape a skewed
    web corpus needs (one mega-host/mega-user key would otherwise land
    in a single hash partition and serialize the whole exchange).

    Mechanism: (1) hot-key detection via the mergeable Misra-Gries
    heavy-hitter aggregate (``ops.sketch``): <= ``capacity`` counters
    per aggregate leaf no matter how many distinct keys stream by, no
    hash shuffle.  MG guarantees every key with true frequency >
    N/capacity survives with est in [true - N/capacity, true], so the
    threshold hot_factor x N/capacity can miss only borderline keys —
    and the hot/cold SPLIT is correctness-free: any split unions to
    the same inner join (what the SQL oracle checks); only load
    balance depends on it.  (2) hot keys' right-side rows (bounded by
    the hot-key count) are collected once and broadcast via
    ``ray.put``, so hot rows join per-batch with NO shuffle — a
    mega-key never lands in one hash partition; (3) the cold remainder
    takes the normal hash join."""
    if num_partitions is None:
        # data-aware width: Ray's hash shuffle pays a fixed per-partition
        # aggregator cost, so the cold leg's width follows the table size
        num_partitions = _join_partitions(sf_dir, "events")

    import pyarrow.parquet as pq
    from gleaner_ray.ops.sketch import topk_heavy_hitters

    capacity = 4096
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    hh = topk_heavy_hitters(events, "user_id", k=capacity, capacity=capacity)
    thresh = hot_factor * max(1.0, n_rows / capacity)
    hot = hh.loc[hh["est_count"] >= thresh, "value"].to_numpy(dtype="int64")
    hot_arr = pa.array(hot)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])

    def cold_leg_of(left):
        # right side stays the FULL customer table: hot keys contribute
        # no left rows here, so no duplicates — and the right side can
        # never degenerate to a schemaless empty exchange (Ray 2.49's
        # hash join rejects fully-empty sides)
        return left.join(
            cust,
            join_type="inner",
            num_partitions=num_partitions,
            on=("user_id",),
            right_on=("c_custkey",),
        ).select_columns(["event_id", "user_id", "c_mktsegment"])

    if len(hot) == 0:
        return cold_leg_of(events)

    def hot_side(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_custkey"], value_set=hot_arr))

    # bounded by the hot-key count (each right key is unique in customer)
    hot_cust = pa.Table.from_pylist(
        cust.map_batches(hot_side, batch_format="pyarrow").take_all(),
        schema=pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
    )
    hot_ref = ray.put(hot_cust)

    class HotJoin:
        def __init__(self):
            self.right = ray.get(hot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["user_id"], value_set=hot_arr))
            return t.join(
                self.right, keys=["user_id"], right_keys=["c_custkey"], join_type="inner"
            )

    hot_leg = events.map_batches(HotJoin, batch_format="pyarrow", concurrency=2)

    # MG with < capacity entries never truncated -> counts are exact AND
    # complete, so "every observed key is hot" is decidable exactly; a
    # truncated summary implies > capacity distinct keys, hence a cold
    # remainder certainly exists.
    all_hot = len(hh) < capacity and len(hh) > 0 and bool((hh["est_count"] >= thresh).all())
    if all_hot:
        return hot_leg

    cold_events = events.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["user_id"], value_set=hot_arr))),
        batch_format="pyarrow",
    )
    return hot_leg.union(cold_leg_of(cold_events))


def mode_segment_by_nation(sf_dir: str):
    """Per-group MODE with a deterministic tie-break: the most frequent
    c_mktsegment per c_nationkey, smallest segment string on ties.

    Partial (nation, segment) counts per block, Sum groupby, then the
    argmax over the bounded nations x segments table on the driver —
    the same bounded-final-reduce shape as ``quantiles_lineitem``."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c_nationkey", "c_mktsegment"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: nations x segments
    )
    counts = counts.sort_values(
        ["c_nationkey", "n", "c_mktsegment"], ascending=[True, False, True], kind="mergesort"
    )
    top = counts.groupby("c_nationkey", as_index=False).first()
    return pd.DataFrame(
        {
            "c_nationkey": top["c_nationkey"].astype("int64"),
            "mode_segment": top["c_mktsegment"],
            "mode_count": top["n"].astype("int64"),
        }
    ).sort_values("c_nationkey", ignore_index=True)


def heavy_hitters_events(sf_dir: str, capacity: int = 128):
    """Exact heavy-hitter keys — ``GROUP BY user_id HAVING count(*) *
    capacity > N`` parity — via the Misra-Gries sketch-then-verify
    composition (``ops.sketch.heavy_hitters_exact``): the MG aggregate
    finds the guaranteed candidate superset in <= capacity counters
    with NO key shuffle, then one partial-count pass over candidates
    only verifies exactly.  At 10^10 rows the exchange is bounded by
    capacity x blocks, vs a full key-space groupby for the naive plan.

    capacity=128 < the 150 distinct users at every SF, so the sketch's
    decrement/truncate path is exercised by the query itself, not just
    the unit tests."""
    from gleaner_ray.ops.sketch import heavy_hitters_exact

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return heavy_hitters_exact(events, "user_id", capacity=capacity)


def quantiles_unbounded(
    sf_dir: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    stride: int = 64,
    table: str = "orders",
    col: str = "o_totalprice",
):
    """EXACT quantiles over an UNBOUNDED value domain (every value
    distinct) — the companion to ``quantiles_lineitem``'s bounded-domain
    count reduction: distributed selection by sample-bracket + exact
    second pass, never a global sort.

    Pass 1 (sample): each block contributes every ``stride``-th value of
    its sorted order plus its row count. For the merged sample, the true
    rank of the j-th smallest sampled value differs from ``(j+1)*stride``
    by at most ``stride`` per block, so a bracket of samples widened by
    ``n_blocks*stride`` ranks on each side provably contains the target
    order statistic. Pass 2 (exact): one streaming pass counts values
    below each bracket's floor and ships ONLY in-bracket values (bounded
    by the rank slack, ~2*stride*n_blocks per quantile) to the driver,
    which selects the exact answer. A widen-and-retry loop guards the
    bound (it cannot trip under the analysis; belt-and-braces for NaN
    padding / empty blocks).

    Scale dial: driver memory is O(n/stride + stride*B) — pick stride ~
    sqrt(n/B) so both terms stay ~sqrt(n*B); at 10^10 rows / 1e4 blocks
    that is ~1e7 float64s (80 MB) per side. Rank semantics = DuckDB
    quantile_disc: smallest value whose cumulative count reaches
    ceil(q*n)."""
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[col].to_numpy(dtype=np.float64))
        picks = v[stride - 1 :: stride]
        return pd.DataFrame(
            {
                "vals": [picks.tobytes()],
                "n": np.array([len(v)], dtype=np.int64),
            }
        )

    parts = ds.map_batches(sample, batch_format="pandas").to_pandas()
    n_blocks = len(parts)
    total = int(parts["n"].sum())
    samples = np.sort(
        np.concatenate(
            [np.frombuffer(b, dtype=np.float64) for b in parts["vals"]]
        )
        if n_blocks
        else np.zeros(0)
    )
    ranks = {q: max(1, int(np.ceil(q * total))) for q in qs}

    slack = n_blocks * stride
    for _attempt in range(4):
        brackets = {}
        for q, r in ranks.items():
            lo_idx = (r - slack) // stride - 1
            hi_idx = -(-(r + slack) // stride)
            lo = samples[lo_idx] if 0 <= lo_idx < len(samples) else -np.inf
            hi = samples[hi_idx] if hi_idx < len(samples) else np.inf
            brackets[q] = (lo, hi)

        def second(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy(dtype=np.float64)
            rows = []
            for q, (lo, hi) in brackets.items():
                rows.append(
                    {
                        "q": q,
                        "n_below": int((v < lo).sum()),
                        "vals": v[(v >= lo) & (v <= hi)].tobytes(),
                    }
                )
            return pd.DataFrame(rows)

        got = ds.map_batches(second, batch_format="pandas").to_pandas()
        out = {}
        ok = True
        for q, r in ranks.items():
            g = got[got["q"] == q]
            below = int(g["n_below"].sum())
            inb = np.sort(
                np.concatenate([np.frombuffer(b, dtype=np.float64) for b in g["vals"]])
            )
            k = r - below - 1
            if 0 <= k < len(inb):
                out["p%02d" % round(q * 100)] = inb[k]
            else:
                ok = False
                break
        if ok:
            return pd.DataFrame([out])
        slack *= 2
    raise RuntimeError("quantile bracket failed to converge")


def outliers_events(sf_dir: str):
    """Per-group 3-sigma anomaly filter with EXACT arithmetic: an event
    is an outlier iff (n*x - s)^2 > 9*(n*m2 - s^2) for its event_type's
    moment sums (s = sum of value cents, m2 = sum of squared cents) —
    the z-score test cleared of denominators, so no mean, no variance,
    no sqrt ever materializes.

    Bit-exactness contract (same family as ``per_group_corr``): the
    per-row left side (n*x - s) fits int64 and converts to float64
    exactly (< 2^53); its square and the comparison are single IEEE
    ops identical across engines; the per-group right side is computed
    ONCE in arbitrary-precision Python ints (HUGEINT in the oracle)
    and rounded to float64 by the same half-even rule both engines
    share. Beyond ~2^53 cents-scale moments the int64 PARTIALS need
    the hugeint/object path — the seam is the partial() dtype below.

    Scale shape: one streaming pass emits per-batch (type, n, s, m2)
    int64 partials -> a groups-sized reduce; thresholds broadcast in
    the closure; pass 2 is a vectorized filter. Events never shuffle."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["value"] * 100).round().astype("int64")
        out = pd.DataFrame(
            {"event_type": df["event_type"], "n": 1, "s": c, "m2": c * c}
        )
        return out.groupby("event_type", as_index=False).sum()

    mom = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("m2", alias_name="m2")
        )
        .to_pandas()
    )
    # thresholds in exact Python ints, one float64 rounding at the end
    stats = {
        r["event_type"]: (int(r["n"]), int(r["s"]), float(9 * (int(r["n"]) * int(r["m2"]) - int(r["s"]) ** 2)))
        for _, r in mom.iterrows()
    }

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["value"] * 100).round().astype("int64").to_numpy()
        n = df["event_type"].map(lambda t: stats[t][0]).to_numpy(dtype=np.int64)
        s = df["event_type"].map(lambda t: stats[t][1]).to_numpy(dtype=np.int64)
        rhs = df["event_type"].map(lambda t: stats[t][2]).to_numpy(dtype=np.float64)
        d = (n * c - s).astype(np.float64)
        keep = d * d > rhs
        out = df.loc[keep, ["event_id", "event_type"]].copy()
        out["value_cents"] = c[keep]
        return out

    return ds.map_batches(flag, batch_format="pandas")


def dense_rank_events(sf_dir: str):
    """Per-group DENSE_RANK over a bounded value domain, shuffle-free:
    ranks depend only on the DISTINCT (group, value) set, so pass 1
    reduces the corpus to that bounded table (per-batch distinct
    partials -> one groups x values reduce), the driver ranks it and
    broadcasts the (group, value) -> rank map, and pass 2 assigns ranks
    with a vectorized probe — events never shuffle, no window exchange.
    (For unbounded domains swap pass 1 for the ``quantiles_unbounded``
    sample-bracket machinery; the seam is the distinct table.)

    Output: (event_id, event_type, value_cents, rnk) with rnk =
    DENSE_RANK() OVER (PARTITION BY event_type ORDER BY value_cents
    DESC)."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_cents": (df["value"] * 100).round().astype("int64"),
            }
        )
        return out.drop_duplicates(ignore_index=True)

    dist = (
        ds.map_batches(distinct_partial, batch_format="pandas")
        .groupby(["event_type", "value_cents"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    dist = dist.sort_values(["event_type", "value_cents"], ascending=[True, False], ignore_index=True)
    dist["rnk"] = dist.groupby("event_type").cumcount() + 1
    rank_map = {
        t: (g["value_cents"].to_numpy()[::-1].copy(), g["rnk"].to_numpy()[::-1].copy())
        for t, g in dist.groupby("event_type")
    }
    ref = ray.put(rank_map)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        c = (df["value"] * 100).round().astype("int64").to_numpy()
        rnk = np.empty(len(df), dtype=np.int64)
        types = df["event_type"].to_numpy(dtype=object)
        for t in pd.unique(types):
            sel = types == t
            vals, ranks = m[t]
            rnk[sel] = ranks[np.searchsorted(vals, c[sel])]
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "value_cents": c,
                "rnk": rnk,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def stream_window_events(
    sf_dir: str, window_s: int = 300, lateness_s: int = 600, jitter_s: int = 7200
):
    """Event-time STREAMING window semantics in batch clothing: per
    event_type stream, an event is LATE — and dropped, never counted —
    iff its event time is older than the stream's watermark at arrival
    (running max event time over prior arrivals minus ``lateness_s``);
    survivors aggregate into tumbling ``window_s`` counts. This is the
    bounded-lateness contract a streaming engine enforces with per-key
    watermark state; expressed over a replayable log the watermark is a
    windowed cummax, which keeps the operator deterministic and
    SQL-oracle-checkable while an actor-pool version (same math, state
    in ``__init__``) would drop identical rows on a live stream.

    Arrival simulation: the log records event time, not delivery, so
    arrival order is event time plus a deterministic md5-derived
    delivery delay bounded by ``jitter_s`` (network reordering both
    engines reproduce digit-for-digit).

    Scale shape: ONE hash exchange co-partitions event types (same seam
    as ``sessionize_events``); inside each partition the watermark,
    late filter and window counts are fully vectorized; output is
    bounded by types x windows. Returns (event_type, window_start, n,
    n_late) — late drops are accounted, not silent."""
    import hashlib as _hashlib

    from gleaner_ray.cluster import cluster_cpus

    num_partitions = max(8, cluster_cpus(8))
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "ts"]
    )

    def add_pid(df: pd.DataFrame) -> pd.DataFrame:
        pid = pd.util.hash_array(df["event_type"].to_numpy(dtype=object)) % np.uint64(
            num_partitions
        )
        delay = np.fromiter(
            (
                int(_hashlib.md5(str(int(k)).encode()).hexdigest()[:8], 16)
                % (jitter_s * 1_000_000)
                for k in df["event_id"]
            ),
            dtype=np.int64,
            count=len(df),
        )
        return df.assign(
            pid=pid.astype("int64"), arr=df["ts"].astype("int64") + delay
        )

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        # event_id tiebreak keeps the arrival order total (equal-arr
        # peers would otherwise be engine-order-dependent)
        df = df.sort_values(
            ["event_type", "arr", "event_id"], kind="mergesort", ignore_index=True
        )
        new_type = df["event_type"].ne(df["event_type"].shift())
        ts_us = df["ts"].astype("int64")
        # running max of PRIOR arrivals within the type: C-level cummax
        # shifted one, reset at type boundaries
        grp = new_type.cumsum()
        prior_max = ts_us.groupby(grp).cummax().shift()
        prior_max[new_type] = np.nan
        late = prior_max.notna() & (ts_us < prior_max - lateness_s * 1_000_000)
        kept = df.loc[~late]
        win = (kept["ts"].astype("int64") // (window_s * 1_000_000)) * (
            window_s * 1_000_000
        )
        out = (
            pd.DataFrame(
                {
                    "event_type": kept["event_type"],
                    "window_start": pd.to_datetime(win, unit="us"),
                }
            )
            .groupby(["event_type", "window_start"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype("int64")
        n_late = (
            df.loc[late].groupby("event_type", as_index=False).size().rename(columns={"size": "nl"})
        )
        out = out.merge(n_late, on="event_type", how="left")
        out["n_late"] = out["nl"].fillna(0).astype("int64")
        return out[["event_type", "window_start", "n", "n_late"]].sort_values(
            ["event_type", "window_start"], ignore_index=True
        )

    return (
        ds.map_batches(add_pid, batch_format="pandas")
        .groupby("pid")
        .map_groups(per_partition, batch_format="pandas")
    )


def percent_rank_events(sf_dir: str):
    """Per-group PERCENT_RANK over a bounded value domain, shuffle-free
    (same distinct-table reduction as ``dense_rank_events``):
    rank(x) = 1 + count of group rows with smaller value, so both rank
    and the (rank-1)/(n-1) scaling derive from the (group, value) COUNT
    table — per-batch count partials, one bounded reduce, driver prefix
    sums, broadcast probe. One small-int division per distinct value;
    events never shuffle.

    Output: (event_id, event_type, value_cents, pr) matching
    PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value_cents)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_cents": (df["value"] * 100).round().astype("int64"),
                "n": 1,
            }
        )
        return out.groupby(["event_type", "value_cents"], as_index=False).sum()

    cnt = (
        ds.map_batches(count_partial, batch_format="pandas")
        .groupby(["event_type", "value_cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "value_cents"], ignore_index=True)
    )
    cnt["below"] = (
        cnt.groupby("event_type")["n"].cumsum() - cnt["n"]
    ).astype("int64")
    totals = cnt.groupby("event_type")["n"].transform("sum").astype("int64")
    cnt["pr"] = np.where(
        totals > 1, cnt["below"].to_numpy() / np.maximum(totals - 1, 1), 0.0
    )
    pr_map = {
        t: (g["value_cents"].to_numpy().copy(), g["pr"].to_numpy().copy())
        for t, g in cnt.groupby("event_type")
    }
    ref = ray.put(pr_map)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        c = (df["value"] * 100).round().astype("int64").to_numpy()
        pr = np.empty(len(df), dtype=np.float64)
        types = df["event_type"].to_numpy(dtype=object)
        for t in pd.unique(types):
            sel = types == t
            vals, prs = m[t]
            pr[sel] = prs[np.searchsorted(vals, c[sel])]
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "value_cents": c,
                "pr": pr,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def q3_shipping(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3 composition — the multi-join + aggregate + top-k
    pipeline shape: customers of one market segment, their orders
    placed before the cutoff, revenue of lineitems shipped after it,
    top-k orders by revenue.

    Scale shape (minimize shuffles): (1) lineitem pre-aggregates to one
    revenue row per order *inside* map_batches before any exchange, so
    the only lineitem-side shuffle carries (orderkey, partial) rows;
    (2) orders filter by date then LEFT SEMI join against the segment's
    custkeys (keys only cross the wire); (3) the bounded per-order
    aggregate joins back to the qualified orders; (4) top-k is
    per-block candidates + ONE bounded merge — no global sort. Revenue
    is exact integer micro-units (cents x (100 - pct)), so partial sums
    are order-independent and hash-identical to the SQL oracle.
    """
    from ray.data.aggregate import Sum

    cut = pd.Timestamp(cutoff)
    nparts = _join_partitions(sf_dir, "orders")

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cust_keys = cust.map_batches(
        lambda df: df.loc[df["c_mktsegment"] == segment, ["c_custkey"]],
        batch_format="pandas",
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(lambda df: df[df["o_orderdate"] < cut], batch_format="pandas")
    qualified = orders.join(
        cust_keys,
        join_type="left_semi",
        num_partitions=nparts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] > cut]
        cents = (df["l_extendedprice"] * 100).round().astype("int64")
        pct = (df["l_discount"] * 100).round().astype("int64")
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"], "revenue_u": cents * (100 - pct)})
        return out.groupby("l_orderkey", as_index=False).sum()

    rev = (
        li.map_batches(li_partial, batch_format="pandas")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_u", alias_name="revenue_u"))
    )

    joined = rev.join(
        qualified,
        join_type="inner",
        num_partitions=nparts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    cols = ["l_orderkey", "revenue_u", "o_orderdate", "o_orderpriority"]

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_u", "l_orderkey"], ascending=[False, True]).head(k)[cols]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["revenue_u", "l_orderkey"], ascending=[False, True], ignore_index=True)
            .head(k)
        )

    return (
        joined.map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_size=None, batch_format="pandas")
    )


def above_order_avg_lineitems(sf_dir: str):
    """Correlated-subquery decorrelation: lineitems whose quantity
    exceeds the average quantity of their own order —
    ``WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem l2 WHERE
    l2.l_orderkey = l.l_orderkey)``.

    The classic decorrelation: ONE per-key aggregate (sum, count) built
    from map-side partials, then a hash join back to the fact table and
    a cross-multiplied integer predicate ``q * cnt > sum`` — exact, no
    division, no float boundary (quantities are integral). The only
    exchanges are the (orderkey, sum, cnt) aggregate and the join keyed
    on the same column — the pattern reuses one partitioning key end to
    end, as a planner's decorrelation rewrite would."""
    from ray.data.aggregate import Sum

    nparts = _join_partitions(sf_dir, "lineitem")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].round().astype("int64")
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"], "sum_q": q, "cnt": np.int64(1)})
        return out.groupby("l_orderkey", as_index=False).sum()

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("l_orderkey")
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("cnt", alias_name="cnt"))
    )

    joined = li.join(
        agg.map_batches(lambda df: df.rename(columns={"l_orderkey": "agg_orderkey"}), batch_format="pandas"),
        join_type="inner",
        num_partitions=nparts,
        on=("l_orderkey",),
        right_on=("agg_orderkey",),
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].round().astype("int64")
        keep = q * df["cnt"].astype("int64") > df["sum_q"].astype("int64")
        out = df.loc[keep, ["l_orderkey", "l_linenumber"]].copy()
        out["qty"] = q[keep]
        return out

    return joined.map_batches(pick, batch_format="pandas")


def _moments_by_type(sf_dir: str):
    """Shared exact-int64 moment totals (n, Sx, Sy, Sxy, Sxx, Syy) per
    event_type over (value cents, hour-of-day) — the partial-aggregate
    feed for corr / regression finishes."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["ts"].dt.hour.to_numpy().astype("int64")
        y = np.floor(df["value"].to_numpy() * 100.0).astype("int64")
        t = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        return t.groupby("event_type", as_index=False).sum()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
    )


def regr_value_on_hour(sf_dir: str):
    """Per-group simple linear regression — ``regr_slope(value_cents,
    hour), regr_intercept(...) GROUP BY event_type`` parity.

    Same exactness device as :func:`corr_value_hour_by_type` (x = hour
    so the regressor moments match SQL's): every batch reduces to exact
    int64 moments, the exchange is a 6-column groupby-Sum, and slope /
    intercept are single float expressions evaluated in the same
    operation order as the oracle — bit-identical doubles."""
    totals = _moments_by_type(sf_dir)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype("float64")
        sx = df["sx"].astype("float64")
        sy = df["sy"].astype("float64")
        slope = (n * df["sxy"].astype("float64") - sx * sy) / (
            n * df["sxx"].astype("float64") - sx * sx
        )
        intercept = (sy - slope * sx) / n
        return pd.DataFrame(
            {"event_type": df["event_type"], "slope": slope, "intercept": intercept}
        )

    return totals.map_batches(finish, batch_format="pandas")


def _event_value_count_table(sf_dir: str):
    """(events Dataset, per-(event_type, value_cents) row-count table).

    The shared pass-1 reduction behind the window-function family
    (rank/dense_rank/percent_rank/cume_dist/median): per-batch count
    partials shrink the corpus to the bounded (group, value) domain,
    ONE small groupby-Sum reduces them, and the driver sorts the
    result. Events themselves never shuffle."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_cents": (df["value"] * 100).round().astype("int64"),
                "n": 1,
            }
        )
        return out.groupby(["event_type", "value_cents"], as_index=False).sum()

    cnt = (
        ds.map_batches(count_partial, batch_format="pandas")
        .groupby(["event_type", "value_cents"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "value_cents"], ignore_index=True)
    )
    return ds, cnt


def _probe_by_type(ds, table_map_ref, out_col: str, out_dtype):
    """Pass-2 broadcast probe shared by the rank family: per batch,
    searchsorted each group's sorted value array and emit the mapped
    statistic — vectorized, zero exchange."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(table_map_ref)
        c = (df["value"] * 100).round().astype("int64").to_numpy()
        out = np.empty(len(df), dtype=out_dtype)
        types = df["event_type"].to_numpy(dtype=object)
        for t in pd.unique(types):
            sel = types == t
            vals, stat = m[t]
            out[sel] = stat[np.searchsorted(vals, c[sel])]
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "value_cents": c,
                out_col: out,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def rank_events(sf_dir: str):
    """Per-group RANK() **with gaps** — ``RANK() OVER (PARTITION BY
    event_type ORDER BY value_cents DESC)`` parity, shuffle-free.

    rank(x) = 1 + count of group rows with a LARGER value, so the whole
    window function collapses to the bounded (group, value) count table
    (:func:`_event_value_count_table`): sort each group descending,
    exclusive prefix-sum gives the "rows above" count, broadcast the
    (value -> rank) map, probe per batch. The gap structure (ties share
    a rank, next rank jumps by tie size) falls out of the prefix sum —
    no window exchange, events never shuffle."""
    ds, cnt = _event_value_count_table(sf_dir)
    cnt = cnt.sort_values(
        ["event_type", "value_cents"], ascending=[True, False], ignore_index=True
    )
    cnt["rnk"] = (cnt.groupby("event_type")["n"].cumsum() - cnt["n"] + 1).astype("int64")
    rank_map = {
        t: (g["value_cents"].to_numpy()[::-1].copy(), g["rnk"].to_numpy()[::-1].copy())
        for t, g in cnt.groupby("event_type")
    }
    return _probe_by_type(ds, ray.put(rank_map), "rnk", np.int64)


def cume_dist_events(sf_dir: str):
    """Per-group CUME_DIST() — ``CUME_DIST() OVER (PARTITION BY
    event_type ORDER BY value_cents)`` parity: fraction of group rows
    with value <= x, i.e. inclusive-prefix-sum / group total over the
    same bounded count table. One double division per DISTINCT value
    (evaluated in the oracle's operation order); events never
    shuffle."""
    ds, cnt = _event_value_count_table(sf_dir)
    le = cnt.groupby("event_type")["n"].cumsum().astype("int64")
    totals = cnt.groupby("event_type")["n"].transform("sum").astype("int64")
    cnt["cd"] = le.to_numpy() / totals.to_numpy()
    cd_map = {
        t: (g["value_cents"].to_numpy().copy(), g["cd"].to_numpy().copy())
        for t, g in cnt.groupby("event_type")
    }
    return _probe_by_type(ds, ray.put(cd_map), "cd", np.float64)


def mad_outliers_events(sf_dir: str, k: int = 5):
    """Robust per-group outlier filter: |x - median| > k * MAD, the
    median/median-absolute-deviation twin of the 3-sigma z-test in
    :func:`outliers_events` — the robust statistic a long-tailed web
    corpus needs (one mega-page shifts a mean, not a median).

    Exactness device (no float medians anywhere): interpolated medians
    live in half-integers, so everything runs in scaled integer units —
    m2 = lo+hi = 2*median(value_cents) from the count table's prefix
    sums; per-value deviation d = |4*value_cents - 2*m2| = 4*|x-median|
    (exact int64); the d-distribution REUSES the same counts (two
    values may fold onto one d — re-aggregate), so mad4 = d_lo + d_hi
    = 8*MAD is again exact. Keep iff 2*d > k*mad4, an all-integer
    predicate both engines evaluate identically.

    Scale shape: two bounded-table reductions (values, then folded
    deviations) both derived from ONE corpus pass; thresholds broadcast
    as two ints per group; the filter pass is vectorized and
    shuffle-free."""
    ds, cnt = _event_value_count_table(sf_dir)

    def _median2(values: np.ndarray, counts: np.ndarray) -> int:
        cum = np.cumsum(counts)
        n = int(cum[-1])
        lo = int(values[np.searchsorted(cum, (n + 1) // 2)])
        hi = int(values[np.searchsorted(cum, n // 2 + 1)])
        return lo + hi

    stats: dict[str, tuple[int, int]] = {}
    for t, g in cnt.groupby("event_type"):
        v = g["value_cents"].to_numpy()
        n = g["n"].to_numpy()
        m2 = _median2(v, n)
        d = np.abs(4 * v - 2 * m2)
        order = np.argsort(d, kind="stable")
        d_sorted = d[order]
        n_sorted = n[order]
        # fold equal deviations (x below and x above the median collide)
        uniq, inv = np.unique(d_sorted, return_inverse=True)
        folded = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(folded, inv, n_sorted)
        mad4 = _median2(uniq, folded)
        stats[t] = (m2, mad4)
    ref = ray.put(stats)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        c = (df["value"] * 100).round().astype("int64").to_numpy()
        types = df["event_type"].to_numpy(dtype=object)
        keep = np.zeros(len(df), dtype=bool)
        dev = np.zeros(len(df), dtype=np.int64)
        for t in pd.unique(types):
            sel = types == t
            m2, mad4 = m[t]
            d = np.abs(4 * c[sel] - 2 * m2)
            dev[sel] = d
            keep[sel] = 2 * d > k * mad4
        out = pd.DataFrame(
            {
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "value_cents": c,
                "dev4": dev,
            }
        )
        return out[keep]

    return ds.map_batches(flag, batch_format="pandas")


def quantiles_cont_events(sf_dir: str, qs: tuple[float, ...] = (0.5, 0.95)):
    """Interpolated quantiles (``quantile_cont`` / PERCENTILE_CONT
    parity) per group — the continuous twin of
    :func:`quantiles_lineitem`'s discrete rank pick, from the same
    bounded (group, value) count table: position p = q*(n-1) in the
    sorted multiset, result = v[floor(p)] + frac*(v[floor(p)+1] -
    v[floor(p)]). Both neighbors come from two searchsorted probes of
    the cumulative counts; no sort shuffle, events never shuffle."""
    _, cnt = _event_value_count_table(sf_dir)

    rows = []
    for t, g in cnt.groupby("event_type"):
        v = g["value_cents"].to_numpy()
        c = g["n"].to_numpy()
        cum = np.cumsum(c)
        n = int(cum[-1])
        row: dict = {"event_type": t}
        for q in qs:
            p = q * (n - 1)
            lo_rank = int(np.floor(p)) + 1  # 1-based
            frac = p - np.floor(p)
            v_lo = float(v[np.searchsorted(cum, lo_rank)])
            v_hi = float(v[np.searchsorted(cum, min(lo_rank + 1, n))])
            row["p%02d" % round(q * 100)] = v_lo + (v_hi - v_lo) * frac
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    return rd.from_pandas(out)


def multi_regr_events(sf_dir: str):
    """Multi-feature closed-form linear regression — value_cents on
    (hour-of-day, day-of-week) with intercept, the distributed
    normal-equations shape: one pass reduces every batch to exact int64
    moment partials of X'X and X'y (features are small ints, so every
    moment is exact), ONE bounded groupby-Sum merges them per group,
    and the 3x3 system solves on the driver by Cramer's rule over
    arbitrary-precision integer determinants — the only floats are the
    final det_i/det divisions, evaluated in the same operation order as
    the oracle's HUGEINT expression. The corpus never shuffles; the
    exchange is 10 integer columns per group. (This is the training
    twin of ops/text.hashed_model_scores' inference: fit the quality
    model ON the cluster with zero iterations.)"""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    MOM = ["n", "sa", "sb", "saa", "sab", "sbb", "sy", "say", "sby"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df["ts"].dt.hour.astype("int64")
        # isodow (1=Mon..7=Sun) — pandas dayofweek is 0-based Monday
        b = df["ts"].dt.dayofweek.astype("int64") + 1
        y = (df["value"] * 100).round().astype("int64")
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n": 1,
                "sa": a,
                "sb": b,
                "saa": a * a,
                "sab": a * b,
                "sbb": b * b,
                "sy": y,
                "say": a * y,
                "sby": b * y,
            }
        )
        return out.groupby("event_type", as_index=False).sum()

    mom = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in MOM])
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )

    rows = []
    for r in mom.itertuples(index=False):
        # X'X = [[n, Sa, Sb], [Sa, Saa, Sab], [Sb, Sab, Sbb]],
        # X'y = [Sy, Say, Sby] — exact Python ints
        n, sa, sb = int(r.n), int(r.sa), int(r.sb)
        saa, sab, sbb = int(r.saa), int(r.sab), int(r.sbb)
        sy, say, sby = int(r.sy), int(r.say), int(r.sby)
        det = n * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb) + sb * (sa * sab - saa * sb)
        d0 = sy * (saa * sbb - sab * sab) - sa * (say * sbb - sab * sby) + sb * (say * sab - saa * sby)
        d1 = n * (say * sbb - sab * sby) - sy * (sa * sbb - sab * sb) + sb * (sa * sby - say * sb)
        d2 = n * (saa * sby - say * sab) - sa * (sa * sby - say * sb) + sy * (sa * sab - saa * sb)
        rows.append(
            {
                "event_type": r.event_type,
                "intercept": d0 / det,
                "beta_hour": d1 / det,
                "beta_dow": d2 / det,
            }
        )
    return rd.from_pandas(pd.DataFrame(rows))


def ntile_events(sf_dir: str, n: int = 4, tie_cap: int = 5_000_000):
    """Per-group NTILE(n) — ``NTILE(n) OVER (PARTITION BY event_type
    ORDER BY value_cents, event_id)`` parity, shuffle-free under the
    tie cap (:func:`global_rank_events` is the global-order sibling;
    this one is the partitioned window).

    NTILE needs ROW_NUMBER (a total order), not just a rank: the base
    position comes from the bounded (group, value) count table
    (exclusive prefix sum = rows with a smaller value) and the
    within-tie order from the TIED rows only — values with count>1, a
    set bounded by tie volume, tiny when values are near-distinct.
    Under ``tie_cap`` their sorted event_ids broadcast as a
    (group, value) -> ids map probed per batch (events never shuffle);
    beyond, a (group, value)-keyed map_groups assigns within-tie order
    (groups are tie-sized, never partition-sized). Tile boundaries
    follow the SQL rule: the first cnt%n tiles take ceil(cnt/n) rows.
    Both paths are equality-tested."""
    ds, cnt = _event_value_count_table(sf_dir)
    cnt = cnt.sort_values(["event_type", "value_cents"], ignore_index=True)
    cnt["base"] = (cnt.groupby("event_type")["n"].cumsum() - cnt["n"]).astype("int64")
    totals = cnt.groupby("event_type")["n"].sum().astype("int64").to_dict()
    base_map = {
        t: (g["value_cents"].to_numpy().copy(), g["base"].to_numpy().copy())
        for t, g in cnt.groupby("event_type")
    }
    ties = cnt[cnt["n"] > 1]
    tie_volume = int(ties["n"].sum())

    def tiles_for(rn: np.ndarray, total: int) -> np.ndarray:
        q, rem = divmod(total, n)
        big = rem * (q + 1)
        return np.where(
            rn <= big, (rn - 1) // (q + 1) + 1, rem + (rn - 1 - big) // max(q, 1) + 1
        ).astype(np.int64)

    if tie_volume <= tie_cap:
        tie_keys = set(zip(ties["event_type"], ties["value_cents"]))

        def tie_rows(df: pd.DataFrame) -> pa.Table:
            # arrow out: Ray's block-size estimator chokes on 0-row
            # pandas blocks with object columns (np.vectorize warning)
            c = (df["value"] * 100).round().astype("int64")
            keys = list(zip(df["event_type"], c))
            mask = np.fromiter((k in tie_keys for k in keys), dtype=bool, count=len(df))
            out = df[mask]
            return pa.table(
                {
                    "event_type": pa.array(out["event_type"], pa.string()),
                    "value_cents": pa.array(c[mask].to_numpy(np.int64)),
                    "event_id": pa.array(out["event_id"].to_numpy(np.int64)),
                }
            )

        tie_df = ds.map_batches(tie_rows, batch_format="pandas").to_pandas()
        tie_map = {
            k: np.sort(g["event_id"].to_numpy(np.int64))
            for k, g in tie_df.groupby(["event_type", "value_cents"])
        }
        state = ray.put((base_map, totals, tie_map))

        def assign(df: pd.DataFrame) -> pd.DataFrame:
            bmap, tot, tmap = ray.get(state)
            c = (df["value"] * 100).round().astype("int64").to_numpy()
            eid = df["event_id"].to_numpy(np.int64)
            rn = np.empty(len(df), dtype=np.int64)
            tile = np.empty(len(df), dtype=np.int64)
            types = df["event_type"].to_numpy(dtype=object)
            for t in pd.unique(types):
                sel = np.where(types == t)[0]
                vals, base = bmap[t]
                b = base[np.searchsorted(vals, c[sel])]
                r = np.ones(len(sel), dtype=np.int64)
                for j, i in enumerate(sel):
                    ids = tmap.get((t, c[i]))
                    if ids is not None:
                        r[j] = np.searchsorted(ids, eid[i]) + 1
                rn[sel] = b + r
                tile[sel] = tiles_for(rn[sel], tot[t])
            return pd.DataFrame(
                {
                    "event_id": df["event_id"],
                    "event_type": df["event_type"],
                    "value_cents": c,
                    "tile": tile,
                }
            )

        return ds.map_batches(assign, batch_format="pandas")

    # scale path: within-tie order via tie-sized map_groups
    tie_vals = {t: set(g["value_cents"]) for t, g in ties.groupby("event_type")}

    def split_tie(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["value"] * 100).round().astype("int64")
        tv = df["event_type"].map(lambda t: tie_vals.get(t, ()))
        is_tie = np.fromiter((v in s for v, s in zip(c, tv)), dtype=bool, count=len(df))
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "value_cents": c,
                "is_tie": is_tie,
            }
        )

    keyed = ds.map_batches(split_tie, batch_format="pandas")

    def order_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("event_id", ignore_index=True)
        df["r"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["event_id", "event_type", "value_cents", "r"]]

    # vectorized is_tie split (Arrow mask per batch, not a per-row
    # Python predicate over the full event table)
    tied = (
        keyed.map_batches(
            lambda t: t.filter(t.column("is_tie").combine_chunks()), batch_format="pyarrow"
        )
        .groupby(["event_type", "value_cents"])
        .map_groups(order_group, batch_format="pandas")
    )
    single = keyed.map_batches(
        lambda t: t.filter(pc.invert(t.column("is_tie").combine_chunks())),
        batch_format="pyarrow",
    ).map_batches(
        lambda df: df.drop(columns=["is_tie"]).assign(r=np.ones(len(df), dtype=np.int64)),
        batch_format="pandas",
    )
    both = tied.union(single)
    state = ray.put((base_map, totals))

    def assign2(df: pd.DataFrame) -> pd.DataFrame:
        bmap, tot = ray.get(state)
        c = df["value_cents"].to_numpy(np.int64)
        rn = np.empty(len(df), dtype=np.int64)
        tile = np.empty(len(df), dtype=np.int64)
        types = df["event_type"].to_numpy(dtype=object)
        r_arr = df["r"].to_numpy(np.int64)
        for t in pd.unique(types):
            sel = np.where(types == t)[0]
            vals, base = bmap[t]
            rn[sel] = base[np.searchsorted(vals, c[sel])] + r_arr[sel]
            tile[sel] = tiles_for(rn[sel], tot[t])
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "value_cents": c,
                "tile": tile,
            }
        )

    return both.map_batches(assign2, batch_format="pandas")
