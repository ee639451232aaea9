"""Relational operator library over the TPC-H-ish test tables.

The crawl pipeline needs only a handful of relational shapes (broadcast
semi-join, groupby dedup); this module fills out the general-purpose
surface a user of the engine gets, each op oracle-checkable in ANSI SQL:

- ``filter_project``   — pruned read + vectorized predicate
- ``grouped_agg``      — partial per-batch combine, then small groupby
- ``broadcast_join``   — small side via ray.put, lookup per batch
- ``hash_join``        — both sides large: Dataset.join (hash shuffle)
- ``topk``             — per-batch top-k, merge (no global sort)
- ``distinct``         — hash groupby
- ``tumbling_window``  — event-time windows as key-bucket groupby
- ``asof_join``        — per-key pd.merge_asof inside map_groups (an
  operator Ray Data lacks; partitioning assumption: rows of one key fit
  one group — salt wide keys upstream if not)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

__all__ = [
    "filter_project",
    "grouped_agg_q1",
    "broadcast_join_orders_customers",
    "hash_join_lineitem_orders",
    "topk_orders",
    "distinct_segments",
    "tumbling_window_events",
    "asof_join_events_orders",
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
    """orders ⨝ customer on custkey — the small side broadcast once."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    lookup_ref = ray.put(
        {
            k: (n, s)
            for k, n, s in zip(
                cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist(), cust["c_mktsegment"].to_pylist()
            )
        }
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    class Join:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_pylist()
            names, segs, keep = [], [], []
            for i, k in enumerate(keys):
                hit = self.lookup.get(k)
                if hit is None:
                    continue
                keep.append(i)
                names.append(hit[0])
                segs.append(hit[1])
            out = t.take(pa.array(keep, pa.int32())) if len(keep) < t.num_rows else t
            return out.append_column("c_name", pa.array(names)).append_column(
                "c_mktsegment", pa.array(segs)
            )

    return orders.map_batches(Join, batch_format="pyarrow", concurrency=2)


def hash_join_lineitem_orders(sf_dir: str, num_partitions: int = 8):
    """Both sides large -> Ray Data's hash-partitioned join on the key."""
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_custkey"])
    joined = lineitem.join(
        orders, join_type="inner", num_partitions=num_partitions, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    return joined


def topk_orders(sf_dir: str, k: int = 10):
    """Top-k orders by totalprice: per-batch top-k then tiny merge —
    no global sort shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nlargest(k, ["o_totalprice", "o_orderkey"])

    partials = ds.map_batches(local_topk, batch_format="pandas")
    merged = partials.to_pandas().nlargest(k, ["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    return merged.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True], ignore_index=True)


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


def asof_join_events_orders(sf_dir: str):
    """For each event, the user's most recent order at event time.

    Custom operator Ray Data lacks: bucket both sides by key, sort by
    time within group, ``pd.merge_asof`` per group. Partitioning
    assumption: one user's rows fit in one group (salt by time range
    for pathological keys). Matches DuckDB ASOF JOIN."""
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    import pyarrow.parquet as pq

    orders_tbl = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    orders_ref = ray.put(orders_tbl.to_pandas())

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        orders = ray.get(orders_ref) if isinstance(orders_ref, ray.ObjectRef) else orders_ref
        uid = group["user_id"].iloc[0]
        mine = orders[orders.o_custkey == uid].sort_values("o_orderdate")
        group = group.sort_values("ts")
        if mine.empty:
            out = group.assign(o_orderkey=pd.NA, o_orderdate=pd.NaT)
        else:
            out = pd.merge_asof(group, mine, left_on="ts", right_on="o_orderdate", direction="backward")
        out["o_orderkey"] = out["o_orderkey"].astype("Int64")
        return out[["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"]]

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
