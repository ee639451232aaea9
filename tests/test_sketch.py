"""HyperLogLog approx-distinct: bounded relative error vs DuckDB's
exact COUNT(DISTINCT), exact merge-invariance under re-blocking, and
the integer clz kernel vs the Python bit-length reference."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from gleaner_ray.ops.sketch import _clz64, approx_distinct, hll_estimate

SF = "/root/testdata/sf0.001"


def test_clz64_matches_bit_length():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(0, 2**63, size=500, dtype=np.int64).astype(np.uint64),
            np.array([0, 1, 2**63, 2**64 - 1, 2**52, 2**53, 2**53 + 1], dtype=np.uint64),
        ]
    )
    got = _clz64(vals)
    want = np.array([64 - int(v).bit_length() for v in vals])
    assert (got == want).all()


@pytest.mark.parametrize(
    "table,col",
    [("documents", "doc_id"), ("events", "user_id"), ("documents", "lang"), ("lineitem", "l_partkey")],
)
def test_accuracy_vs_exact(ray_session, table, col):
    import ray.data as rd

    path = f"{SF}/{table}.parquet"
    est = approx_distinct(rd.read_parquet(path, columns=[col]), col)
    exact = duckdb.sql(f"SELECT COUNT(DISTINCT {col}) FROM read_parquet('{path}')").fetchone()[0]
    # p=12 -> sigma ~1.6%; 5% is >3 sigma, and linear counting makes the
    # small-cardinality cases near-exact
    assert abs(est - exact) / max(exact, 1) < 0.05


def test_merge_invariance(ray_session):
    import ray.data as rd

    path = f"{SF}/lineitem.parquet"
    ds = rd.read_parquet(path, columns=["l_partkey"])
    e1 = approx_distinct(ds, "l_partkey")
    e2 = approx_distinct(ds.repartition(7), "l_partkey")
    assert e1 == e2  # register max-merge is associative+commutative


def test_estimate_empty_and_saturated():
    assert hll_estimate(np.zeros(1 << 12, dtype=np.int64)) == 0.0
    # all registers set -> falls through to the raw estimator, positive
    assert hll_estimate(np.full(1 << 12, 3, dtype=np.int64)) > 0


def test_grouped_accuracy_vs_exact(ray_session):
    import ray.data as rd
    from gleaner_ray.ops.sketch import approx_distinct_by

    path = f"{SF}/events.parquet"
    got = approx_distinct_by(
        rd.read_parquet(path, columns=["event_type", "user_id"]), "event_type", "user_id"
    )
    exact = duckdb.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n FROM read_parquet('{path}') "
        "GROUP BY 1 ORDER BY 1"
    ).df()
    assert list(got["event_type"]) == list(exact["event_type"])
    for e, a in zip(exact["n"], got["approx_distinct"]):
        assert abs(a - e) / max(e, 1) < 0.05


class TestHeavyHitters:
    def test_mg_truncate_bounds(self):
        from gleaner_ray.ops.sketch import _mg_truncate

        counts = {f"v{i}": i for i in range(1, 21)}  # N=210
        out = _mg_truncate(dict(counts), capacity=5)
        assert len(out) <= 5
        for k, c in out.items():
            assert c <= counts[k]  # never overestimates

    def test_topk_on_skewed_stream(self, ray_session):
        import ray.data as rd
        from gleaner_ray.ops.sketch import topk_heavy_hitters

        rows = []
        true = {}
        for i in range(5):
            n = 1000 - 50 * i
            true[f"hot{i}"] = n
            rows += [{"tok": f"hot{i}"}] * n
        rows += [{"tok": f"rare{j}"} for j in range(5000)]
        n_total = len(rows)
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(9)
        got = topk_heavy_hitters(ds, "tok", k=5, capacity=256)
        # separation (50) > N/capacity (~37): top-5 identity+order exact
        assert list(got["value"]) == [f"hot{i}" for i in range(5)]
        for v, est in zip(got["value"], got["est_count"]):
            assert true[v] - n_total / 256 <= est <= true[v]


class TestHeavyHittersExact:
    def test_matches_exact_having_on_skewed_stream(self, ray_session):
        # adversarial stream: 150 distinct keys >> capacity 16, so the
        # decrement/truncate path fires many times; the composition must
        # still return EXACTLY the HAVING cnt*capacity > N set
        import ray.data as rd

        from gleaner_ray.ops.sketch import heavy_hitters_exact

        rng = np.random.default_rng(11)
        hot = np.repeat(np.arange(3, dtype=np.int64), [900, 700, 500])
        cold = rng.integers(10, 160, size=4000).astype(np.int64)
        vals = np.concatenate([hot, cold])
        rng.shuffle(vals)
        df = pd.DataFrame({"k": vals})
        ds = rd.from_pandas(df).repartition(11)
        got = (
            heavy_hitters_exact(ds, "k", capacity=16)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        n = len(df)
        vc = df["k"].value_counts()
        want = vc[vc * 16 > n].sort_index()
        assert list(got["k"]) == list(want.index)
        assert list(got["cnt"]) == list(want.values)  # exact, not estimates

    def test_events_query_matches_sql(self, ray_session):
        from gleaner_ray.relational import heavy_hitters_events

        got = (
            heavy_hitters_events(SF)
            .to_pandas()
            .sort_values("user_id", ignore_index=True)
        )
        want = duckdb.sql(
            f"SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1 "
            f"HAVING COUNT(*) * 128 > (SELECT COUNT(*) FROM read_parquet('{SF}/events.parquet')) "
            "ORDER BY 1"
        ).df()
        assert got["user_id"].tolist() == want["user_id"].tolist()
        assert got["cnt"].tolist() == want["cnt"].tolist()

    def test_empty_and_no_heavy(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sketch import heavy_hitters_exact

        empty = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64")}))
        assert heavy_hitters_exact(empty, "k").count() == 0
        # uniform stream with capacity far below distinct: nothing heavy
        uni = rd.from_pandas(pd.DataFrame({"k": np.arange(1000, dtype=np.int64)}))
        assert heavy_hitters_exact(uni, "k", capacity=8).count() == 0


def test_empty_input(ray_session):
    import ray.data as rd
    from gleaner_ray.ops.sketch import approx_distinct, topk_heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"tok": ["a", "b"]})).filter(lambda r: False)
    assert approx_distinct(ds, "tok") == 0.0
    got = topk_heavy_hitters(ds, "tok", k=3)
    assert len(got) == 0
