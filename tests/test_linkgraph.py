"""Link-graph operators: extraction, degree, integer PageRank and
min-label components — fixture graph with known structure, plus
broadcast-path vs join-path equality (the two scale regimes must
agree bit-for-bit)."""

import numpy as np
import pandas as pd
import pytest


def _page(url: str, hrefs: list[str]) -> dict:
    nav = "".join('<a href="%s">x</a>' % h for h in hrefs)
    html = ("<html><head></head><body><p>p</p><nav>%s</nav></body></html>" % nav).encode()
    return {"url": url, "html": html}


@pytest.fixture(scope="module")
def tiny_graph(ray_session):
    """Two components: {a,b,c} a->b->c->a cycle, {d,e} d->e; f isolated."""
    import ray.data as rd

    rows = [
        _page("https://h1.org/a", ["https://h1.org/b"]),
        _page("https://h1.org/b", ["https://h2.org/c"]),
        _page("https://h2.org/c", ["https://h1.org/a", "https://h1.org/a"]),  # dup edge kept
        _page("https://h2.org/d", ["https://h2.org/e"]),
        _page("https://h2.org/e", []),
        _page("https://h3.org/f", []),
    ]
    return rd.from_items(rows)


class TestExtraction:
    def test_outlinks_multigraph(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import outlinks

        df = outlinks(tiny_graph).to_pandas()
        assert len(df) == 5  # duplicate anchor kept (multigraph)
        assert (df.src == "https://h2.org/c").sum() == 2

    def test_outlink_degree_row_local(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import outlink_degree

        d = outlink_degree(tiny_graph).to_pandas().set_index("url")["out_degree"]
        assert d["https://h2.org/c"] == 2
        assert d["https://h3.org/f"] == 0

    def test_indegree_distinct_targets(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import indegree

        d = indegree(tiny_graph).to_pandas().set_index("url")["in_degree"]
        assert d["https://h1.org/a"] == 2  # duplicated c->a edge counts twice
        assert d["https://h2.org/e"] == 1
        assert "https://h3.org/f" not in d.index  # no inlinks -> absent

    def test_host_edges_weights(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import host_edges

        df = host_edges(tiny_graph).to_pandas()
        w = {(r.src_host, r.dst_host): r.n_links for r in df.itertuples()}
        assert w[("h2.org", "h1.org")] == 2  # the duplicated c->a edge
        assert w[("h1.org", "h2.org")] == 1
        assert w[("h2.org", "h2.org")] == 1


class TestPageRank:
    def test_mass_and_cycle_symmetry(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import PAGERANK_BASE, pagerank_int

        df = pagerank_int(tiny_graph, iters=3).to_pandas().set_index("url")["rank_fp"]
        # every rank positive, total below BASE (leaky variant)
        assert (df > 0).all() and df.sum() <= PAGERANK_BASE
        # e receives d's whole rank; f receives nothing -> e strictly above f
        assert df["https://h2.org/e"] > df["https://h3.org/f"]
        # cycle members have equal in/out structure after >=3 rounds of a
        # symmetric start -> equal ranks
        assert df["https://h1.org/a"] == df["https://h1.org/b"] == df["https://h2.org/c"]

    @pytest.mark.slow
    def test_broadcast_equals_join_path(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import pagerank_int

        a = pagerank_int(tiny_graph, iters=2).to_pandas().sort_values("url").reset_index(drop=True)
        b = (
            pagerank_int(tiny_graph, iters=2, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[["url", "rank_fp"]]
        )
        assert a["rank_fp"].dtype == np.int64
        pd.testing.assert_frame_equal(a, b.astype({"rank_fp": np.int64}))

    @pytest.mark.slow
    def test_trustrank_seed_mass_and_path_parity(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import trustrank_int

        a = (
            trustrank_int(tiny_graph, n_seeds=2, iters=2)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        t = a.set_index("url")["trust_fp"]
        # seeds are the 2 lexicographically-smallest urls (a, b); trust
        # flows only along outlinks from them — f (no trusted inlinks,
        # not a seed) converges to exactly 0
        assert t["https://h3.org/f"] == 0
        assert t["https://h1.org/a"] > 0 and t["https://h1.org/b"] > 0
        # both non-broadcast fallbacks agree bit-for-bit
        for kw in ({"broadcast_nodes": 0}, {"driver_edges": 0}):
            b = (
                trustrank_int(tiny_graph, n_seeds=2, iters=2, **kw)
                .to_pandas()
                .sort_values("url")
                .reset_index(drop=True)[["url", "trust_fp"]]
            )
            pd.testing.assert_frame_equal(a, b.astype({"trust_fp": np.int64}))

    @pytest.mark.slow
    def test_spam_mass_bounds_and_path_parity(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import spam_mass

        a = (
            spam_mass(tiny_graph, n_seeds=2, iters=2)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert ((a["spam"] >= 0) & (a["spam"] <= 1)).all()
        s = a.set_index("url")
        # f earns rank only from uniform teleport and zero trust -> its
        # entire mass is unendorsed (spam exactly 1)
        assert s.loc["https://h3.org/f", "trust_fp"] == 0
        assert s.loc["https://h3.org/f", "spam"] == 1.0
        # the general join path computes the identical table
        b = (
            spam_mass(tiny_graph, n_seeds=2, iters=2, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[["url", "rank_fp", "trust_fp", "spam"]]
        )
        pd.testing.assert_frame_equal(
            a, b.astype({"rank_fp": np.int64, "trust_fp": np.int64})
        )

    def test_distributed_rounds_equal_driver_rounds(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import pagerank_int

        a = pagerank_int(tiny_graph, iters=2).to_pandas().sort_values("url").reset_index(drop=True)
        b = (
            pagerank_int(tiny_graph, iters=2, driver_edges=0)  # force streaming rounds
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_rank_priority_tiers(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import PAGERANK_BASE, rank_priority

        df = rank_priority(tiny_graph, iters=3).to_pandas().set_index("url")
        t = PAGERANK_BASE // 6
        for url, row in df.iterrows():
            want = "hot" if row.rank_fp >= 2 * t else ("warm" if row.rank_fp >= t else "cold")
            assert row.priority == want, url
        # f gets only teleport mass -> cold; the cycle holds >= uniform mass
        assert df.loc["https://h3.org/f", "priority"] == "cold"
        assert set(df.priority) >= {"cold"}

    def test_empty_input(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import pagerank_int

        empty = rd.from_arrow(pa.table({"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())}))
        assert pagerank_int(empty).count() == 0


class TestHits:
    def test_hand_computed_fixed_point(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import HITS_BASE, hits_int

        df = hits_int(tiny_graph, iters=2).to_pandas().set_index("url")
        h0 = HITS_BASE // 6  # 166_666_666_666
        # round-2 authority: a receives 2x c's round-1 hub (the dup edge)
        assert df.loc["https://h1.org/a", "auth_fp"] == 2 * 4 * h0
        assert df.loc["https://h1.org/b", "auth_fp"] == h0
        assert df.loc["https://h2.org/d", "auth_fp"] == 0  # no in-links
        # round-2 hub: S = 19*h0 > BASE -> scale 3; c holds 2x a's auth
        assert df.loc["https://h2.org/c", "hub_fp"] == (2 * 8 * h0) // 3
        assert df.loc["https://h1.org/a", "hub_fp"] == h0 // 3
        assert df.loc["https://h2.org/e", "hub_fp"] == 0  # no out-links
        assert df.loc["https://h3.org/f", ["auth_fp", "hub_fp"]].tolist() == [0, 0]
        # c is the dominant hub, a the dominant authority
        assert df.hub_fp.idxmax() == "https://h2.org/c"
        assert df.auth_fp.idxmax() == "https://h1.org/a"

    @pytest.mark.slow
    def test_broadcast_equals_join_path(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import hits_int

        a = hits_int(tiny_graph, iters=2).to_pandas().sort_values("url").reset_index(drop=True)
        b = (
            hits_int(tiny_graph, iters=2, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[["url", "auth_fp", "hub_fp"]]
        )
        assert a["auth_fp"].dtype == np.int64
        pd.testing.assert_frame_equal(a, b.astype({"auth_fp": np.int64, "hub_fp": np.int64}))

    def test_distributed_rounds_equal_driver_rounds(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import hits_int

        a = hits_int(tiny_graph, iters=2).to_pandas().sort_values("url").reset_index(drop=True)
        b = (
            hits_int(tiny_graph, iters=2, driver_edges=0)  # force streaming half-steps
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_empty_input(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import hits_int

        empty = rd.from_arrow(pa.table({"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())}))
        assert hits_int(empty).count() == 0


class TestComponents:
    def test_two_components_plus_isolate(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import components_min_label

        df = components_min_label(tiny_graph, iters=4).to_pandas().set_index("url")["component"]
        assert df["https://h1.org/a"] == df["https://h1.org/b"] == df["https://h2.org/c"] == "https://h1.org/a"
        assert df["https://h2.org/d"] == df["https://h2.org/e"] == "https://h2.org/d"
        assert df["https://h3.org/f"] == "https://h3.org/f"

    @pytest.mark.slow
    def test_broadcast_equals_join_path(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import components_min_label

        a = components_min_label(tiny_graph, iters=3).to_pandas().sort_values("url").reset_index(drop=True)
        b = (
            components_min_label(tiny_graph, iters=3, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[["url", "component"]]
        )
        pd.testing.assert_frame_equal(a, b)


class TestMirrorHosts:
    def test_cross_host_shared_content(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import mirror_hosts

        rows = [
            # X served on h1 twice (within-host dup: counts ONCE) and h2
            {"url": "https://h1.org/x1", "html": b"X"},
            {"url": "https://h1.org/x2", "html": b"X"},
            {"url": "https://h2.org/x", "html": b"X"},
            # Y on h1 and h3
            {"url": "https://h1.org/y", "html": b"Y"},
            {"url": "https://h3.org/y", "html": b"Y"},
            # Z unique to h2
            {"url": "https://h2.org/z", "html": b"Z"},
        ]
        df = mirror_hosts(rd.from_items(rows)).to_pandas()
        w = {(r.host_a, r.host_b): r.shared for r in df.itertuples()}
        assert w == {("h1.org", "h2.org"): 1, ("h1.org", "h3.org"): 1}

    def test_no_mirrors(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import mirror_hosts

        rows = [
            {"url": "https://h1.org/a", "html": b"A"},
            {"url": "https://h2.org/b", "html": b"B"},
        ]
        assert mirror_hosts(rd.from_items(rows)).count() == 0


class TestFoldReduce:
    def test_fold_reduce_caps(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.fold import fold_reduce

        parts = rd.from_items(
            [{"k": "a", "n": 1}, {"k": "b", "n": 2}, {"k": "a", "n": 3}]
        )
        out = fold_reduce(parts, ["k"], {"n": "sum"})
        assert dict(zip(out["k"], out["n"])) == {"a": 4, "b": 2}
        # distinct-key overflow -> None (caller falls back)
        assert fold_reduce(parts, ["k"], {"n": "sum"}, cap=1) is None
        # partial-row pull gate fires before anything is fetched
        assert fold_reduce(parts, ["k"], {"n": "sum"}, cap=10, pull_rows=2) is None
        # the two-value API hands back MATERIALIZED partials on overflow
        # so the caller's distributed fallback reuses the plasma blocks
        from ray.data.dataset import MaterializedDataset

        from gleaner_ray.ops.fold import fold_or_reduce

        folded, mat = fold_or_reduce(parts, ["k"], {"n": "sum"}, cap=1)
        assert folded is None and isinstance(mat, MaterializedDataset)
        agg = mat.groupby("k").sum("n").to_pandas()
        assert dict(zip(agg["k"], agg["sum(n)"])) == {"a": 4, "b": 2}

    @pytest.mark.slow
    def test_folded_ops_distributed_fallback_parity(self, tiny_graph, monkeypatch):
        """Every fold_reduce consumer must produce the identical table on
        its distributed-groupby fallback (the 100-TB path the fold
        short-circuits at test scale)."""
        import gleaner_ray.ops.fold as fold_mod
        from gleaner_ray.ops.linkgraph import anchor_texts, host_edges, indegree, reciprocal_links
        from gleaner_ray.pipelines.recrawl import duplicate_titles, mirror_hosts, url_templates

        def run_all():
            out = {}
            for name, op in (
                ("reciprocal", reciprocal_links),
                ("indegree", indegree),
                ("host_edges", host_edges),
                ("anchor_texts", anchor_texts),
                ("mirror_hosts", mirror_hosts),
                ("duplicate_titles", duplicate_titles),
                ("url_templates", url_templates),
            ):
                df = op(tiny_graph).to_pandas()
                out[name] = df.sort_values(list(df.columns), ignore_index=True).astype(
                    {c: "int64" for c in df.columns if df[c].dtype.kind == "i"}
                )
            return out

        fast = run_all()
        monkeypatch.setattr(fold_mod, "fold_reduce", lambda *a, **k: None)
        slow = run_all()
        for name in fast:
            pd.testing.assert_frame_equal(fast[name], slow[name][fast[name].columns]), name


class TestDiscovered:
    @pytest.fixture(scope="class")
    def graph_with_external(self, ray_session):
        import ray.data as rd

        rows = [
            _page("https://h1.org/a", ["https://h1.org/b", "https://ext.net/x"]),
            _page("https://h1.org/b", ["https://ext.net/x", "https://ext.net/y"]),
        ]
        return rd.from_items(rows)

    def test_counts(self, graph_with_external):
        from gleaner_ray.ops.linkgraph import discovered_urls

        d = discovered_urls(graph_with_external).to_pandas().set_index("url")["n_refs"]
        assert d.to_dict() == {"https://ext.net/x": 2, "https://ext.net/y": 1}

    def test_broadcast_equals_join_path(self, graph_with_external):
        from gleaner_ray.ops.linkgraph import discovered_urls

        a = discovered_urls(graph_with_external).to_pandas().sort_values("url").reset_index(drop=True)
        b = (
            discovered_urls(graph_with_external, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[["url", "n_refs"]]
        )
        pd.testing.assert_frame_equal(a, b.astype({"n_refs": np.int64}))

    @pytest.mark.slow
    def test_external_links_dont_leak_into_rank_or_components(self, graph_with_external):
        from gleaner_ray.ops.linkgraph import components_min_label, pagerank_int

        pr = pagerank_int(graph_with_external, iters=2).to_pandas()
        assert set(pr.url) == {"https://h1.org/a", "https://h1.org/b"}
        # a's only INTERNAL link is a->b: with externals excluded from
        # out-degree, b gets a's whole contribution both rounds
        cm = components_min_label(graph_with_external, iters=2).to_pandas()
        assert set(cm.url) == {"https://h1.org/a", "https://h1.org/b"}
        assert (cm.component == "https://h1.org/a").all()
        # join paths agree on the same external-bearing graph
        prj = pagerank_int(graph_with_external, iters=2, broadcast_nodes=0).to_pandas()
        m = pr.merge(prj, on="url", suffixes=("", "_j"))
        assert (m.rank_fp == m.rank_fp_j).all()


class TestAnchorsAndPairs:
    def test_anchor_texts_profile(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import anchor_texts

        rows = [
            _page("https://h1.org/a", []),
            _page("https://h1.org/b", []),
        ]
        # distinct texts sorted + joined; counts include duplicate texts
        rows[0]["html"] = (
            b'<html><body><a href="https://h1.org/t">beta</a>'
            b'<a href="https://h1.org/t">alpha</a></body></html>'
        )
        rows[1]["html"] = b'<html><body><a href="https://h1.org/t">beta</a></body></html>'
        df = anchor_texts(rd.from_items(rows)).to_pandas()
        assert len(df) == 1
        r = df.iloc[0]
        assert r["url"] == "https://h1.org/t"
        assert r["n_anchors"] == 3
        assert r["texts"] == "alpha|beta"

    def test_reciprocal_pairs_only(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import reciprocal_links

        rows = [
            _page("https://h1.org/a", ["https://h1.org/b", "https://h1.org/a"]),  # self-loop dropped
            _page("https://h1.org/b", ["https://h1.org/a", "https://h1.org/b"]),
            _page("https://h1.org/c", ["https://h1.org/a"]),  # one-way only
        ]
        df = reciprocal_links(rd.from_items(rows)).to_pandas()
        assert len(df) == 1
        assert tuple(df.iloc[0]) == ("https://h1.org/a", "https://h1.org/b")

    def test_duplicate_titles(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import duplicate_titles

        rows = [
            {"url": "https://h1.org/a", "html": b"<html><head><title>Same</title></head></html>"},
            {"url": "https://h2.org/b", "html": b"<html><head><title>Same</title></head></html>"},
            {"url": "https://h1.org/c", "html": b"<html><head><title>Only</title></head></html>"},
            {"url": "https://h1.org/d", "html": b"{}"},  # no markup, no title
        ]
        df = duplicate_titles(rd.from_items(rows)).to_pandas()
        assert len(df) == 1
        r = df.iloc[0]
        assert r["title"] == "Same" and r["n_pages"] == 2 and r["first_url"] == "https://h1.org/a"

    def test_url_templates_trap_detection(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import url_templates

        rows = (
            [{"url": "https://h1.org/cal/%d/%d/item" % (2020 + i % 3, i)} for i in range(6)]
            + [{"url": "https://h1.org/p/deadbeef0123"}]  # long hex segment
            + [{"url": "https://h1.org/about"}]  # no variable segment
            + [{"url": "https://h2.org/x/7"}]  # numeric at end-of-path
        )
        df = url_templates(rd.from_items(rows), trap_threshold=6).to_pandas()
        t = df.set_index("template")
        # consecutive numeric segments both collapse (the double pass)
        assert t.loc["https://h1.org/cal/{n}/{n}/item", "n_urls"] == 6
        assert bool(t.loc["https://h1.org/cal/{n}/{n}/item", "trap"])
        assert t.loc["https://h1.org/p/{x}", "n_urls"] == 1
        assert t.loc["https://h1.org/about", "n_urls"] == 1
        assert t.loc["https://h2.org/x/{n}", "n_urls"] == 1
        assert not t.loc["https://h1.org/about", "trap"]
        assert set(df.host) == {"h1.org", "h2.org"}


class TestTriangles:
    @pytest.fixture(scope="class")
    def triangle_graph(self, ray_session):
        """K4 on h1..h4 (4 triangles, 3 per host) + pendant h5-h1 +
        isolated-pair h6-h7; directions and duplicates must not matter."""
        import ray.data as rd

        rows = [
            _page("https://h1.org/a", ["https://h2.org/x", "https://h3.org/x", "https://h4.org/x", "https://h5.org/x"]),
            _page("https://h2.org/b", ["https://h3.org/x", "https://h4.org/x", "https://h1.org/y"]),  # h2->h1 reverse dup of h1->h2
            _page("https://h3.org/c", ["https://h4.org/x"]),
            _page("https://h6.org/d", ["https://h7.org/x"]),
            _page("https://h5.org/e", []),
        ]
        return rd.from_items(rows)

    def test_k4_counts(self, triangle_graph):
        from gleaner_ray.ops.linkgraph import host_triangles

        df = host_triangles(triangle_graph).set_index("host")["n_triangles"]
        assert df["h1.org"] == 3 and df["h2.org"] == 3
        assert df["h3.org"] == 3 and df["h4.org"] == 3
        # pendant and isolated-pair hosts appear with zero triangles
        assert df["h5.org"] == 0 and df["h6.org"] == 0 and df["h7.org"] == 0
        assert list(df.index) == sorted(df.index)

    @pytest.mark.slow
    def test_driver_equals_join_path(self, triangle_graph):
        from gleaner_ray.ops import linkgraph as lg

        a = lg.host_triangles(triangle_graph)
        b = lg._triangles_join(lg._undirected_host_pairs(triangle_graph))
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))

    def test_empty_and_no_triangles(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import host_triangles

        chain = rd.from_items(
            [_page("https://a.org/1", ["https://b.org/x"]), _page("https://b.org/1", ["https://c.org/x"])]
        )
        df = host_triangles(chain)
        assert set(df["host"]) == {"a.org", "b.org", "c.org"}
        assert (df["n_triangles"] == 0).all()


class TestHostBudget:
    def test_sums_exactly_and_deterministic(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import host_budget

        df = host_budget(tiny_graph, total_budget=1000, iters=2)
        assert int(df["budget"].sum()) == 1000
        assert list(df["host"]) == sorted(df["host"])
        df2 = host_budget(tiny_graph, total_budget=1000, iters=2)
        pd.testing.assert_frame_equal(df, df2)

    def test_largest_remainder_tiebreak(self):
        # 3 equal ranks, budget 10 -> base 3 each, 1 leftover to the
        # host-ascending first among equal remainders
        from gleaner_ray.ops import linkgraph as lg

        hr = pd.DataFrame({"host": ["b.org", "a.org", "c.org"], "rank_fp": [5, 5, 5]})
        orig = lg.host_rank
        try:
            lg.host_rank = lambda pages, iters=2: hr
            df = lg.host_budget(None, total_budget=10)
        finally:
            lg.host_rank = orig
        got = dict(zip(df["host"], df["budget"]))
        assert got == {"a.org": 4, "b.org": 3, "c.org": 3}
        assert int(df["budget"].sum()) == 10

    def test_zero_budget_and_overflow_safety(self):
        from gleaner_ray.ops import linkgraph as lg

        hr = pd.DataFrame({"host": ["a", "b"], "rank_fp": [10**15, 10**15]})
        orig = lg.host_rank
        try:
            lg.host_rank = lambda pages, iters=2: hr
            # B * rank ~ 1e21 > int64: exact big-int path must not wrap
            df = lg.host_budget(None, total_budget=10**6)
        finally:
            lg.host_rank = orig
        assert int(df["budget"].sum()) == 10**6
        assert set(df["budget"]) == {500_000}


class TestRedirectsAndSoft404:
    def _pages(self):
        import ray.data as rd

        def redir(u, nxt):
            return {
                "url": u,
                "html": (
                    '<head><title>Redirecting</title>'
                    '<meta http-equiv="refresh" content="0; url=%s"></head>' % nxt
                ).encode(),
            }

        rows = [
            # chain a -> b -> c -> T
            redir("https://h/a", "https://h/b"),
            redir("https://h/b", "https://h/c"),
            redir("https://h/c", "https://h/T"),
            # single hop
            redir("https://h/x", "https://h/T2"),
            # loop p <-> q: resolves to SOME chain member with hops capped
            redir("https://h/p", "https://h/q"),
            redir("https://h/q", "https://h/p"),
            {"url": "https://h/T", "html": b"<head><title>Landing</title></head>body"},
        ]
        return rd.from_items(rows)

    def test_chain_resolution(self, ray_session):
        from gleaner_ray.pipelines.recrawl import resolve_redirects

        df = (
            resolve_redirects(self._pages(), max_hops=8)
            .to_pandas()
            .set_index("url")
            .sort_index()
        )
        assert df.loc["https://h/a", "final_url"] == "https://h/T"
        assert int(df.loc["https://h/a", "hops"]) == 3
        assert df.loc["https://h/b", "final_url"] == "https://h/T"
        assert int(df.loc["https://h/b", "hops"]) == 2
        assert df.loc["https://h/x", "final_url"] == "https://h/T2"
        assert int(df.loc["https://h/x", "hops"]) == 1
        # loop members hit the hop cap instead of spinning
        assert int(df.loc["https://h/p", "hops"]) == 8
        assert df.loc["https://h/p", "final_url"] in ("https://h/p", "https://h/q")

    @pytest.mark.slow
    def test_distributed_fallback_parity(self, ray_session):
        from gleaner_ray.pipelines.recrawl import resolve_redirects

        a = resolve_redirects(self._pages(), max_hops=8).to_pandas()
        b = resolve_redirects(self._pages(), max_hops=8, fold_cap=0).to_pandas()
        a = a.sort_values("url", ignore_index=True)
        b = b.sort_values("url", ignore_index=True)[a.columns]
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))

    def test_soft404_rules(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import soft404_pages

        rows = [
            {"url": "u1", "html": b"<head><title>404 Not Found</title></head><body>x</body>"},
            {"url": "u2", "html": b"<head><title>Fine page</title></head><body>The page you requested was not found.</body>"},
            # negative: discusses 404 in the body only
            {"url": "u3", "html": b"<head><title>Status codes</title></head><body>a 404 means gone</body>"},
            # title wins over body when both match
            {"url": "u4", "html": b"<head><title>Oops not found</title></head><body>the page you requested was not found</body>"},
            {"url": "u5", "html": b"<head><title>Normal</title></head><body>hello</body>"},
        ]
        df = soft404_pages(rd.from_items(rows)).to_pandas().set_index("url")
        assert set(df.index) == {"u1", "u2", "u4"}
        assert df.loc["u1", "reason"] == "title"
        assert df.loc["u2", "reason"] == "body"
        assert df.loc["u4", "reason"] == "title"


class TestKcore:
    def test_peeling_semantics(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import kcore

        def page(u, targets):
            html = "".join('<a href="%s">x</a>' % t for t in targets)
            return {"url": u, "html": ("<body>%s</body>" % html).encode()}

        # triangle a-b-c (2-core) + chain c-d-e (peels away)
        rows = [
            page("https://h/a", ["https://h/b", "https://h/c"]),
            page("https://h/b", ["https://h/c"]),
            page("https://h/c", ["https://h/d"]),
            page("https://h/d", ["https://h/e"]),
            page("https://h/e", []),
        ]
        df = kcore(rd.from_items(rows), k=2, rounds=4).to_pandas().set_index("url")
        assert set(df.index) == {"https://h/a", "https://h/b", "https://h/c"}
        assert (df["core_deg"] == 2).all()

    @pytest.mark.slow
    def test_join_path_parity(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import kcore
        from gleaner_ray.sources import synth

        corpus = synth.generate_corpus("/root/testdata/sf0.001")
        import os

        pages = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"])
        a = kcore(pages).to_pandas().sort_values("url", ignore_index=True)
        b = (
            kcore(pages, force_join=True)
            .to_pandas()
            .sort_values("url", ignore_index=True)[["url", "core_deg"]]
        )
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


class TestHostJaccard:
    def test_fixture_values(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import host_jaccard

        df = host_jaccard(tiny_graph).to_pandas()
        # distinct target sets: h1 -> {b, c}; h2 -> {a, e}; h3 -> {}
        # no shared targets between h1 and h2 -> no pairs at all
        assert len(df) == 0

    def test_shared_targets(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import host_jaccard

        rows = [
            _page("https://x.org/1", ["https://t.org/a", "https://t.org/b"]),
            _page("https://x.org/2", ["https://t.org/b"]),  # within-host dup target
            _page("https://y.org/1", ["https://t.org/b", "https://t.org/c"]),
        ]
        df = host_jaccard(rd.from_items(rows)).to_pandas()
        assert len(df) == 1
        r = df.iloc[0]
        # x: {a,b} (2), y: {b,c} (2), inter {b} (1), union 3
        assert (r.host_a, r.host_b, r.n_inter, r.n_union) == ("x.org", "y.org", 1, 3)
        assert r.jaccard == 1.0 / 3.0

    def test_fold_equals_distributed(self, ray_session, monkeypatch):
        import ray.data as rd

        import gleaner_ray.ops.fold as fold
        from gleaner_ray.ops.linkgraph import host_jaccard

        rows = [
            _page("https://x.org/1", ["https://t.org/a", "https://t.org/b"]),
            _page("https://y.org/1", ["https://t.org/b", "https://t.org/c"]),
            _page("https://z.org/1", ["https://t.org/b", "https://t.org/a"]),
        ]
        ds = rd.from_items(rows)
        a = host_jaccard(ds).to_pandas().sort_values(["host_a", "host_b"], ignore_index=True)
        orig = fold.fold_or_reduce

        def no_fold(parts_ds, keys, agg, cap=0, pull_rows=None):
            return orig(parts_ds, keys, agg, cap=0, pull_rows=pull_rows)

        monkeypatch.setattr(fold, "fold_or_reduce", no_fold)
        b = host_jaccard(ds).to_pandas().sort_values(["host_a", "host_b"], ignore_index=True)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


class TestLabelProp:
    def test_triangle_absorbs_pendant(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import label_prop

        # triangle a-b-c (mutual majority) + pendant p hanging off a
        rows = [
            _page("https://h.org/a", ["https://h.org/b", "https://h.org/c", "https://h.org/p"]),
            _page("https://h.org/b", ["https://h.org/a", "https://h.org/c"]),
            _page("https://h.org/c", ["https://h.org/a", "https://h.org/b"]),
            _page("https://h.org/p", []),
        ]
        # synchronous rounds: the pendant lags the triangle by one
        # round (it adopts a's PREVIOUS label each time) — at iters=2
        # the triangle has converged on "a" while p still carries a's
        # round-1 label "b"; one more round pulls p in
        df = label_prop(rd.from_items(rows), iters=2).to_pandas().set_index("url")["community"]
        assert len(set(df[["https://h.org/a", "https://h.org/b", "https://h.org/c"]])) == 1
        assert df["https://h.org/a"] == "https://h.org/a"
        assert df["https://h.org/p"] == "https://h.org/b"
        df3 = label_prop(rd.from_items(rows), iters=3).to_pandas().set_index("url")["community"]
        assert set(df3) == {"https://h.org/a"}

    def test_isolated_keeps_own_label(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import label_prop

        df = label_prop(tiny_graph, iters=2).to_pandas().set_index("url")["community"]
        assert df["https://h3.org/f"] == "https://h3.org/f"

    @pytest.mark.slow
    def test_broadcast_equals_join_path(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import label_prop

        a = label_prop(tiny_graph, iters=2).to_pandas().sort_values("url", ignore_index=True)
        # join path with the driver vote fold, and with fold_cap=0
        # forcing the distributed groupby-Sum + map_groups argmax round
        for kw in ({"broadcast_nodes": 0}, {"broadcast_nodes": 0, "fold_cap": 0}):
            b = (
                label_prop(tiny_graph, iters=2, **kw)
                .to_pandas()
                .sort_values("url", ignore_index=True)[["url", "community"]]
            )
            pd.testing.assert_frame_equal(a, b)


class TestHostMacroStructure:
    @pytest.fixture(scope="class")
    def ring_graph(self, ray_session):
        """a->b->c->a ring (SCC), feeder f->a (IN), sink a->s (OUT),
        isolate z (OTHER). One link per pair; min_links=1."""
        import ray.data as rd

        rows = [
            _page("https://a.org/1", ["https://b.org/1"]),
            _page("https://b.org/1", ["https://c.org/1"]),
            _page("https://c.org/1", ["https://a.org/1", "https://s.org/1"]),
            _page("https://f.org/1", ["https://a.org/1"]),
            _page("https://z.org/1", []),
        ]
        return rd.from_items(rows)

    def test_scc_ring(self, ring_graph):
        from gleaner_ray.ops.linkgraph import host_scc

        df = host_scc(ring_graph, min_links=1).to_pandas().set_index("host")["scc_id"]
        assert df["a.org"] == df["b.org"] == df["c.org"] == "a.org"
        assert df["f.org"] == "f.org"
        assert df["s.org"] == "s.org"  # pure link target becomes a node
        assert df["z.org"] == "z.org"

    def test_scc_threshold_breaks_ring(self, ring_graph):
        from gleaner_ray.ops.linkgraph import host_scc

        df = host_scc(ring_graph, min_links=2).to_pandas().set_index("host")["scc_id"]
        # every edge pruned -> all singletons; link-only hosts vanish
        assert (df.index == df.to_numpy()).all()
        assert "s.org" not in df.index

    def test_bowtie_regions(self, ring_graph):
        from gleaner_ray.ops.linkgraph import host_bowtie

        df = host_bowtie(ring_graph, min_links=1).to_pandas().set_index("host")["region"]
        assert df["a.org"] == df["b.org"] == df["c.org"] == "CORE"
        assert df["f.org"] == "IN"
        assert df["s.org"] == "OUT"
        assert df["z.org"] == "OTHER"

    def test_clustering_triangle_vs_star(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import host_clustering

        rows = [
            # triangle a-b-c plus star hub a->{d,e}
            _page("https://a.org/1", ["https://b.org/1", "https://c.org/1", "https://d.org/1", "https://e.org/1"]),
            _page("https://b.org/1", ["https://c.org/1"]),
        ]
        df = host_clustering(rd.from_items(rows)).to_pandas().set_index("host")
        # a: degree 4, 1 triangle -> 2*1/(4*3)
        assert df.loc["a.org", "clustering"] == pytest.approx(2.0 / 12.0)
        assert df.loc["b.org", "clustering"] == 1.0  # degree 2, 1 triangle
        assert df.loc["d.org", "clustering"] == 0.0  # degree 1

    def test_avg_nbr_degree_paths_agree(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import avg_neighbor_degree

        a = (
            avg_neighbor_degree(tiny_graph)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        b = (
            avg_neighbor_degree(tiny_graph, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url", ignore_index=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # b's only internal target is c (out-degree 2)
        row = a[a.url == "https://h1.org/b"].iloc[0]
        assert (row.sum_nbr_deg, row.n_nbrs, row.avg_nbr_deg) == (2, 1, 2.0)


class TestLocalityAssortativity:
    def test_locality_fixture(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import outlink_locality

        df = outlink_locality(tiny_graph).to_pandas().set_index("host")
        # h1: a->b (self), b->c (internal to h2); no external
        assert (df.loc["h1.org", ["n_self", "n_internal", "n_external"]] == [1, 1, 0]).all()
        # h2: c->a x2 (internal), d->e (self)
        assert (df.loc["h2.org", ["n_self", "n_internal", "n_external"]] == [1, 2, 0]).all()

    def test_locality_external(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import outlink_locality

        rows = [_page("https://a.org/1", ["https://a.org/2", "https://ext.net/x"])]
        df = outlink_locality(rd.from_items(rows)).to_pandas().set_index("host")
        r = df.loc["a.org"]
        assert (r.n_self, r.n_internal, r.n_external) == (1, 0, 1)
        assert r.frac_external == 0.5

    def test_assortativity_paths_agree(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import assortativity

        a = assortativity(tiny_graph).to_pandas()
        b = assortativity(tiny_graph, broadcast_nodes=0).to_pandas()[a.columns]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert a.iloc[0].n_edges == 5  # all tiny_graph targets are internal

    def test_url_depth_hist(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import url_depth_hist

        rows = [
            {"url": "https://a.org/x"},
            {"url": "https://a.org/x/y"},
            {"url": "https://a.org/x/y"},
            {"url": "https://b.org/p/q/r"},
        ]
        df = url_depth_hist(rd.from_items(rows)).to_pandas()
        m = {(r.host, r.depth): r.n_urls for r in df.itertuples()}
        assert m == {("a.org", 1): 1, ("a.org", 2): 2, ("b.org", 3): 1}


class TestReciprocityRate:
    def test_fixture_rate(self, tiny_graph):
        from gleaner_ray.ops.linkgraph import reciprocity_rate

        r = reciprocity_rate(tiny_graph).to_pandas().iloc[0]
        # distinct directed edges: a->b, b->c, c->a, d->e = 4; no pair
        # has both directions
        assert (r.n_edges, r.n_reciprocal_pairs, r.reciprocity) == (4, 0, 0.0)

    def test_mutual_pair(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import reciprocity_rate

        rows = [
            _page("https://a.org/1", ["https://b.org/1", "https://c.org/1"]),
            _page("https://b.org/1", ["https://a.org/1"]),
        ]
        r = reciprocity_rate(rd.from_items(rows)).to_pandas().iloc[0]
        # edges: a->b, a->c, b->a = 3; one mutual pair {a,b}
        assert (r.n_edges, r.n_reciprocal_pairs) == (3, 1)
        assert r.reciprocity == 2.0 / 3.0


class TestHreflang:
    def test_one_way_annotation_closure(self, ray_session):
        """Only the en page annotates; the closure still groups all
        variants, and an unrelated page stays out."""
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import hreflang_clusters

        def alt(url, variants):
            tags = "".join(
                '<link rel="alternate" hreflang="%s" href="%s">' % (l, u)
                for l, u in variants
            )
            return {"url": url, "html": ("<html><head>%s</head><body></body></html>" % tags).encode()}

        en = "https://h.org/alt/0/en"
        de = "https://h.org/alt/0/de"
        fr = "https://h.org/alt/0/fr"
        rows = [
            alt(en, [("en", en), ("de", de), ("fr", fr)]),
            alt(de, []),  # no tags: one-way annotation
            alt(fr, []),
            alt("https://h.org/other", []),
        ]
        df = hreflang_clusters(rd.from_items(rows)).to_pandas().set_index("url")["cluster"]
        assert df[en] == df[de] == df[fr] == de  # 'de' sorts first
        assert "https://h.org/other" not in df.index

    def test_empty_when_no_annotations(self, tiny_graph):
        from gleaner_ray.pipelines.recrawl import hreflang_clusters

        assert hreflang_clusters(tiny_graph).count() == 0


class TestLangLinks:
    def test_matrix_and_path_parity(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.linkgraph import lang_link_matrix

        def p(url, lang, hrefs):
            d = _page(url, hrefs)
            d["lang"] = lang
            return d

        rows = [
            p("https://a.org/en", "en", ["https://a.org/de", "https://a.org/en2", "https://x.net/gone"]),
            p("https://a.org/de", "de", ["https://a.org/en"]),
            p("https://a.org/en2", "en", []),
        ]
        ds = rd.from_items(rows)
        a = lang_link_matrix(ds).to_pandas().sort_values(["lang_src", "lang_dst"], ignore_index=True)
        m = {(r.lang_src, r.lang_dst): r.n_links for r in a.itertuples()}
        # external target dropped; en->de 1, en->en 1, de->en 1
        assert m == {("de", "en"): 1, ("en", "de"): 1, ("en", "en"): 1}
        b = (
            lang_link_matrix(ds, broadcast_nodes=0)
            .to_pandas()
            .sort_values(["lang_src", "lang_dst"], ignore_index=True)[a.columns]
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestDriverEdgeGate:
    """The four ops whose driver-local fast path used to gate on NODE
    count only must now also gate on EDGE count (VERDICT r3 item 1):
    with ``driver_edges=0`` the tiny graph's 5 edges exceed the cap at
    a node count far under ``broadcast_nodes``, so the broadcast helper
    must decline (return None) and the distributed join path must run —
    and stay equality-green vs the broadcast result."""

    def test_edge_ids_driver_declines_over_cap(self, tiny_graph):
        import gleaner_ray.ops.linkgraph as lg

        node_ds = tiny_graph.select_columns(["url"])
        hashes, _ = lg._sorted_node_hashes(node_ds, tiny_graph.count())
        assert lg._edge_ids_driver(tiny_graph, hashes, driver_edges=0) is None
        ids = lg._edge_ids_driver(tiny_graph, hashes, driver_edges=50)
        assert ids is not None and len(ids[0]) == 5

    @pytest.mark.parametrize(
        "op,kwargs,join_name,val_col",
        [
            ("components_min_label", {"iters": 3}, "_components_join", "component"),
            ("seed_depth", {"n_seeds": 2, "iters": 3}, "_seed_depth_join", "depth"),
            ("kcore", {"k": 2, "rounds": 3}, "_kcore_join", "core_deg"),
            ("label_prop", {"iters": 2}, "_label_prop_join", "community"),
        ],
    )
    @pytest.mark.slow
    def test_join_path_runs_and_matches(self, tiny_graph, monkeypatch, op, kwargs, join_name, val_col):
        import gleaner_ray.ops.linkgraph as lg

        fn = getattr(lg, op)
        a = fn(tiny_graph, **kwargs).to_pandas().sort_values("url").reset_index(drop=True)
        calls = []
        real_join = getattr(lg, join_name)
        monkeypatch.setattr(lg, join_name, lambda *x, **k: calls.append(1) or real_join(*x, **k))
        b = (
            fn(tiny_graph, driver_edges=0, **kwargs)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[["url", val_col]]
        )
        assert calls, "%s must take the join path when edges exceed driver_edges" % op
        pd.testing.assert_frame_equal(a[["url", val_col]], b, check_dtype=False)


@pytest.mark.slow
class TestRandomGraphPathParity:
    """Hypothesis-style randomized parity over the three execution
    regimes of the round-sensitive graph kernels: the driver broadcast
    path (np kernels, segment-argmax), the distributed join path with
    the driver vote fold, and the join path with fold_cap=0 (full
    groupby + map_groups argmax). Random digraphs include self-loops,
    duplicate edges and isolated nodes — the corner cases a fixed
    fixture can miss. Seeded rng (not hypothesis strategies): each case
    costs ~2-6 s of Ray execution, so a fixed small seed set keeps the
    runtime bounded while still varying structure."""

    def _random_pages(self, seed: int):
        import numpy as np
        import ray.data as rd

        rng = np.random.default_rng(seed)
        n = int(rng.integers(4, 12))
        urls = ["https://h%d.org/p%02d" % (i % 3, i) for i in range(n)]
        rows = []
        for i, u in enumerate(urls):
            deg = int(rng.integers(0, 4))
            hrefs = [urls[int(rng.integers(0, n))] for _ in range(deg)]  # may self-loop/dup
            rows.append(_page(u, hrefs))
        return rd.from_items(rows)

    @pytest.mark.parametrize("seed", [11, 23, 47])
    def test_label_prop_three_paths_agree(self, ray_session, seed):
        from gleaner_ray.ops.linkgraph import label_prop

        pages = self._random_pages(seed)
        a = label_prop(pages, iters=2).to_pandas().sort_values("url", ignore_index=True)
        for kw in ({"broadcast_nodes": 0}, {"broadcast_nodes": 0, "fold_cap": 0}):
            b = (
                label_prop(pages, iters=2, **kw)
                .to_pandas()
                .sort_values("url", ignore_index=True)[["url", "community"]]
            )
            pd.testing.assert_frame_equal(a[["url", "community"]], b)

    @pytest.mark.parametrize("seed", [13, 29])
    def test_components_both_paths_agree(self, ray_session, seed):
        from gleaner_ray.ops.linkgraph import components_min_label

        pages = self._random_pages(seed)
        a = components_min_label(pages, iters=4).to_pandas().sort_values("url", ignore_index=True)
        b = (
            components_min_label(pages, iters=4, broadcast_nodes=0)
            .to_pandas()
            .sort_values("url", ignore_index=True)[["url", "component"]]
        )
        pd.testing.assert_frame_equal(a[["url", "component"]], b)
