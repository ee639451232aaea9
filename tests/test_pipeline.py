"""End-to-end summon pipeline tests over the deterministic synthetic corpus.

Replays the reference's e2e invariants (cmd/root_internal_test.go):
object counts per prefix, idempotency of a second run, dead-sitemap
isolation, bad-JSON-LD exclusion, duplicate-content dedup — and checks
the Ray pipeline row-for-row (byte-identical jsonld, sha, object name,
object set) against a straight-line sequential oracle implementing the
reference's control flow directly.
"""

import json
import os

import pyarrow.parquet as pq
import pytest

from gleaner_ray.config import ContextOption
from gleaner_ray.extract import extract_candidates
from gleaner_ray.fixups import add_to_json_list_if_valid, process_json
from gleaner_ray.identifier import get_sha
from gleaner_ray.jsonld_lite import Validator
from gleaner_ray.sources.frontier import build_frontier
from gleaner_ray.sources.synth import corpus_config, corpus_fetch, generate_corpus


def sequential_oracle(corpus: str, cfg):
    """The reference's crawl as a single-threaded loop (SURVEY §3.2):
    per source in config order, per URL in sitemap order: extract ->
    validate -> fixups -> sha -> first-writer dedup via object existence."""
    frontier, errors = build_frontier(cfg, corpus_fetch(corpus))
    pages = {}
    pages_dir = os.path.join(corpus, "pages")
    for f in sorted(os.listdir(pages_dir)):
        t = pq.read_table(os.path.join(pages_dir, f))
        for url, html, text in zip(
            t.column("url").to_pylist(), t.column("html").to_pylist(), t.column("text").to_pylist()
        ):
            pages[url] = (html, text)
    validator = Validator()
    seen = set()
    rows = []
    by_source: dict[str, list] = {}
    for url, source, order in zip(
        frontier.column("url").to_pylist(),
        frontier.column("source").to_pylist(),
        frontier.column("sitemap_order").to_pylist(),
    ):
        by_source.setdefault(source, []).append((order, url))
    for source in [s.name for s in cfg.sources]:
        for order, url in sorted(by_source.get(source, [])):
            page = pages.get(url)
            if page is None:
                continue  # HTTP-error analogue
            candidates, _ = extract_candidates(url, page[0], page[1])
            jsonlds = []
            for c in candidates:
                jsonlds, _err = add_to_json_list_if_valid(jsonlds, c, validator)
            for di, doc in enumerate(jsonlds):
                if doc == "":
                    continue
                fixed = process_json(doc, ContextOption.HTTPS, False)
                sha = get_sha(fixed)
                first = sha not in seen
                seen.add(sha)
                rows.append(
                    {
                        "url": url,
                        "source": source,
                        "seq": order,
                        "doc_index": di,
                        "jsonld": fixed,
                        "sha": sha,
                        "object_name": "summoned/%s/%s.jsonld" % (source, sha),
                        "seen_first": first,
                    }
                )
    return rows


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def run(ray_session, corpus, tmp_path_factory):
    from gleaner_ray.pipelines.summon import summon

    out = str(tmp_path_factory.mktemp("summon"))
    cfg = corpus_config(corpus)
    manifest = summon(
        cfg,
        os.path.join(corpus, "pages"),
        out,
        run_date="2026-08-17",
        fetch=corpus_fetch(corpus),
        n_seen_shards=4,
        concurrency=1,
    )
    return {"out": out, "manifest": manifest, "cfg": cfg}


def load_results(out, run_id="run-0000"):
    # hive-partitioned by source: read as a dataset so the partition
    # column is reconstructed
    df = pq.read_table(os.path.join(out, "results", run_id)).to_pandas()
    df["source"] = df["source"].astype(str)
    return df


class TestSummonPipeline:
    def test_row_level_parity_with_sequential_oracle(self, run, corpus):
        oracle = sequential_oracle(corpus, corpus_config(corpus))
        df = load_results(run["out"])
        docs = df[df.doc_index >= 0]
        o_by_key = {(r["url"], r["doc_index"]): r for r in oracle}
        assert len(docs) == len(oracle)
        for _, row in docs.iterrows():
            o = o_by_key[(row["url"], row["doc_index"])]
            assert row["jsonld"] == o["jsonld"], row["url"]  # byte-identical
            assert row["sha"] == o["sha"]
            assert row["object_name"] == o["object_name"]

    def test_object_set_matches_oracle(self, run, corpus):
        oracle = sequential_oracle(corpus, corpus_config(corpus))
        expected_objects = {r["object_name"] for r in oracle if r["seen_first"]}
        root = os.path.join(run["out"], "objects", "gleaner")
        actual = set()
        for dirpath, _, files in os.walk(os.path.join(root, "summoned")):
            for f in files:
                rel = os.path.relpath(os.path.join(dirpath, f), root)
                actual.add(rel)
        # the empty-doc quirk sha (sha1("")) is shared by every source's
        # graph-array page; which source wins the first-writer race is
        # nondeterministic in the reference (goroutines) and here
        # (streaming batches) — compare modulo that object's source
        empty_suffix = "/%s.jsonld" % get_sha("")
        exp_empty = {o for o in expected_objects if o.endswith(empty_suffix)}
        act_empty = {o for o in actual if o.endswith(empty_suffix)}
        assert len(exp_empty) == len(act_empty) == 1
        assert actual - act_empty == expected_objects - exp_empty

    def test_object_contents_byte_identical(self, run, corpus):
        oracle = sequential_oracle(corpus, corpus_config(corpus))
        root = os.path.join(run["out"], "objects", "gleaner")
        content_by_name = {r["object_name"]: r["jsonld"] for r in oracle}
        checked = 0
        for name, text in list(content_by_name.items())[:200]:
            with open(os.path.join(root, name)) as f:
                assert f.read() == text
            checked += 1
        assert checked > 0

    def test_dedup_uploaded_counts(self, run, corpus):
        oracle = sequential_oracle(corpus, corpus_config(corpus))
        n_first = sum(1 for r in oracle if r["seen_first"])
        per_source = run["manifest"]["per_source"]
        assert sum(v["uploaded"] for v in per_source.values()) == n_first

    def test_dead_sitemap_isolated(self, run):
        # dead5's sitemap 404s; other sources still crawled
        assert any("dead5" in e for e in run["manifest"]["frontier_errors"])
        assert run["manifest"]["per_source"]["geo0"]["fetched"] > 0

    def test_invalid_jsonld_excluded(self, run):
        df = load_results(run["out"])
        invalid_pages = df[df.url.str.contains("/ref/invalid/")]
        # invalid pages appear only as zero-candidate markers
        assert (invalid_pages.doc_index == -1).all()
        assert (invalid_pages.seen_first == False).all()  # noqa: E712

    def test_prov_written_for_every_valid_doc(self, run):
        df = load_results(run["out"])
        n_prov = sum(
            len(files)
            for _, _, files in os.walk(os.path.join(run["out"], "objects", "gleaner", "prov"))
        )
        # prov is written before the dedup check (jsonutils.go:378-386):
        # one per (source, url, sha) triple, deduped only by identical text
        docs = df[df.doc_index >= 0]
        assert n_prov == len(docs[["source", "url", "sha"]].drop_duplicates())

    def test_orgs_written(self, run):
        org_dir = os.path.join(run["out"], "objects", "gleaner", "orgs")
        names = sorted(os.listdir(org_dir))
        assert names == ["dead5.nq", "geo0.nq", "head3.nq", "hydro1.nq", "robo4.nq", "wq2.nq"]

    def test_idempotent_second_run(self, run, corpus, ray_session):
        from gleaner_ray.pipelines.summon import summon

        root = os.path.join(run["out"], "objects", "gleaner", "summoned")
        before = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                before[p] = os.path.getmtime(p)
        m2 = summon(
            run["cfg"],
            os.path.join(corpus, "pages"),
            run["out"],
            run_date="2026-08-18",
            fetch=corpus_fetch(corpus),
            n_seen_shards=4,
            concurrency=1,
            resume=True,
        )
        # no new summoned objects, none overwritten (root_internal_test.go:79-106)
        assert sum(v["uploaded"] for v in m2["per_source"].values()) == 0
        after = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                after[p] = os.path.getmtime(p)
        assert before == after

    def test_robots_disallowed_not_crawled(self, run):
        df = load_results(run["out"])
        assert not df.url.str.contains("/private/").any()

    def test_graph_array_quirk_empty_doc(self, run):
        # the original array string becomes an empty doc with sha1("")
        df = load_results(run["out"])
        empty_sha = get_sha("")
        assert (df[df.doc_index >= 0].sha == empty_sha).any()


class TestDecomposedPath:
    """The decomposed stage graph (fused=False) and exact-dedup variant
    must produce the same document rows as the fused streaming path."""

    def test_decomposed_exact_dedup_matches_oracle(self, run, corpus, ray_session, tmp_path_factory):
        from gleaner_ray.pipelines.summon import summon

        out = str(tmp_path_factory.mktemp("summon_dec"))
        manifest = summon(
            corpus_config(corpus),
            os.path.join(corpus, "pages"),
            out,
            run_date="2026-08-17",
            fetch=corpus_fetch(corpus),
            write_objects=False,
            dedup="exact",
            fused=False,
            concurrency=1,
        )
        df = load_results(out)
        oracle = sequential_oracle(corpus, corpus_config(corpus))
        docs = df[df.doc_index >= 0]
        assert len(docs) == len(oracle)
        o_by_key = {(r["url"], r["doc_index"]): r["jsonld"] for r in oracle}
        sample = docs.sample(n=min(300, len(docs)), random_state=7)
        for _, row in sample.iterrows():
            assert row["jsonld"] == o_by_key[(row["url"], row["doc_index"])]
        # exact dedup marks exactly one winner per distinct sha
        assert docs[docs.seen_first].sha.nunique() == docs.sha.nunique()
        assert docs[docs.seen_first].shape[0] == docs.sha.nunique()


class TestHashJoinPath:
    """join='hash' (Dataset.join on url) must produce the same document
    rows as the broadcast-index path."""

    def test_hash_join_matches_broadcast(self, run, corpus, ray_session, tmp_path_factory):
        from gleaner_ray.pipelines.summon import summon

        out = str(tmp_path_factory.mktemp("summon_hash"))
        summon(
            corpus_config(corpus),
            os.path.join(corpus, "pages"),
            out,
            run_date="2026-08-17",
            fetch=corpus_fetch(corpus),
            write_objects=False,
            join="hash",
            concurrency=1,
        )
        hash_df = load_results(out)
        broadcast_df = load_results(run["out"])
        h = hash_df[hash_df.doc_index >= 0].sort_values(["url", "doc_index"], ignore_index=True)
        b = broadcast_df[broadcast_df.doc_index >= 0].sort_values(["url", "doc_index"], ignore_index=True)
        assert len(h) == len(b)
        assert (h.jsonld.values == b.jsonld.values).all()
        assert (h.sha.values == b.sha.values).all()


class TestObjectStoreIntegration:
    def test_usermeta_sidecars_written(self, run, corpus, ray_session, tmp_path_factory):
        """fsspec sink with usermeta: every first-writer object gets a
        .meta.json sidecar carrying url/sha1 (jsonutils.go:360-372)."""
        import glob
        import json as _json

        from gleaner_ray.pipelines.summon import summon

        out = str(tmp_path_factory.mktemp("summon_meta"))
        cfg = corpus_config(corpus)
        summon(
            cfg,
            os.path.join(corpus, "pages"),
            out,
            fetch=corpus_fetch(corpus),
            n_seen_shards=2,
            concurrency=1,
            write_usermeta=True,
        )
        objs = glob.glob(os.path.join(out, "objects", "gleaner", "summoned", "*", "*.jsonld"))
        metas = glob.glob(os.path.join(out, "objects", "gleaner", "summoned", "*", "*.meta.json"))
        assert len(objs) > 0 and len(metas) == len(objs)
        m = _json.load(open(metas[0]))
        assert set(m) == {"url", "sha1", "uniqueid"} and m["sha1"] == m["uniqueid"]
        # object set identical to the default run's (sidecars are extra).
        # A sha that several sources contend for (e.g. sha1("") from the
        # graph-array quirk) lands under whichever source wins the
        # first-writer race, so compare per-source only for shas a single
        # source produces, and the sha set globally.
        base = run["out"]
        base_objs = {
            os.path.relpath(p, os.path.join(base, "objects", "gleaner"))
            for p in glob.glob(os.path.join(base, "objects", "gleaner", "summoned", "*", "*.jsonld"))
        }
        new_objs = {os.path.relpath(p, os.path.join(out, "objects", "gleaner")) for p in objs}
        assert {os.path.basename(p) for p in new_objs} == {os.path.basename(p) for p in base_objs}
        from collections import Counter

        sha_sources = Counter(os.path.basename(p) for p in base_objs | new_objs)
        stable = {p for p in base_objs | new_objs if sha_sources[os.path.basename(p)] == 1}
        assert new_objs & stable == base_objs & stable

    def test_s3_protocol_sink_native_usermeta(self, run, corpus, ray_session):
        """ObjectSink end-to-end through protocol "s3" against a fake
        fsspec s3 backend: endpoint/credentials assembled from the
        parsed minio config, bucket VALIDATE-only semantics
        (minio.go:48-72 — a missing s3 bucket hard-fails instead of
        being created), and native usermeta riding the PutObject call
        at the marked integration point (no .meta.json sidecar)."""
        import fsspec
        import fsspec.implementations.memory
        import pyarrow.dataset as pds

        from gleaner_ray.config import MinioConfig
        from gleaner_ray.objectstore import ObjectStoreClient
        from gleaner_ray.pipelines.summon import ObjectSink

        class FakeS3(fsspec.implementations.memory.MemoryFileSystem):
            protocol = "s3"
            cachable = False
            store = {}
            pseudo_dirs = [""]
            put_metadata: dict = {}
            init_kwargs: dict = {}

            def __init__(self, *a, key=None, secret=None, client_kwargs=None, **kw):
                type(self).init_kwargs = {
                    "key": key,
                    "secret": secret,
                    "client_kwargs": client_kwargs or {},
                }
                super().__init__(*a, **kw)

            def pipe_file(self, path, value, Metadata=None, **kw):
                type(self).put_metadata[self._strip_protocol(path)] = Metadata
                super().pipe_file(path, value)

        fsspec.register_implementation("s3", FakeS3, clobber=True)
        try:
            mc = MinioConfig(
                address="minio.local", port=9000, ssl=False, accesskey="k", secretkey="s"
            )
            # validate-only: the bucket does not exist yet -> hard fail
            with pytest.raises(RuntimeError, match="bucket"):
                ObjectStoreClient("s3://warehouse", "gleaner", minio=mc)
            assert FakeS3.init_kwargs["key"] == "k"
            assert FakeS3.init_kwargs["client_kwargs"]["endpoint_url"] == "http://minio.local:9000"
            FakeS3().makedirs("/warehouse/gleaner", exist_ok=True)

            cfg = corpus_config(corpus)
            sink = ObjectSink(
                "s3://warehouse",
                "gleaner",
                {s.name: s for s in cfg.sources},
                "2026-08-17",
                minio_cfg=mc,
                write_usermeta=True,
            )
            t = (
                pds.dataset(
                    os.path.join(run["out"], "results", "run-0000"),
                    format="parquet",
                    partitioning="hive",
                )
                .to_table()
                .slice(0, 200)
            )
            sink(t)
            stored = set(FakeS3.store)
            summoned = [p for p in stored if "/summoned/" in p]
            assert summoned, "no summoned objects written through s3"
            # native usermeta: metadata captured on the put, NO sidecar
            assert not any(p.endswith(".meta.json") for p in stored)
            meta = FakeS3.put_metadata[summoned[0]]
            assert set(meta) == {"url", "sha1", "uniqueid"} and meta["sha1"] == meta["uniqueid"]
            # prov objects are written (overwrite=True path) alongside
            assert any("/prov/" in p for p in stored)
            # never-overwrite: a second pass issues no new metadata puts
            n_puts = len(FakeS3.put_metadata)
            sink(t)
            assert len(FakeS3.put_metadata) == n_puts
        finally:
            fsspec.register_implementation("s3", "s3fs.S3FileSystem", clobber=True)
            FakeS3.store.clear()
            FakeS3.put_metadata.clear()


@pytest.mark.slow
class TestCheckpointResume:
    """Per-partition checkpoints (north rule): a crash between input-file
    groups must be resumable — committed groups are skipped whole, the
    rest re-run, and the logical union equals a clean one-shot run."""

    @pytest.fixture(scope="class")
    def multi_file_corpus(self, tmp_path_factory):
        # regenerate the sf0.001 corpus with small row groups so the
        # pages table spans several files (the checkpoint unit)
        out = str(tmp_path_factory.mktemp("ckpt_corpus"))
        return generate_corpus("/root/testdata/sf0.001", out_dir=out, rows_per_file=1500)

    @staticmethod
    def _summoned_objects(out):
        import glob

        root = os.path.join(out, "objects", "gleaner")
        return {
            os.path.relpath(p, root)
            for p in glob.glob(os.path.join(root, "summoned", "*", "*.jsonld"))
        }

    def test_crash_then_resume_equals_clean_run(
        self, ray_session, multi_file_corpus, tmp_path_factory, monkeypatch
    ):
        import pandas as _pd
        import ray.data as rd

        from gleaner_ray.pipelines import summon as summon_mod

        corpus = multi_file_corpus
        cfg = corpus_config(corpus)
        pages = os.path.join(corpus, "pages")
        n_files = len([f for f in os.listdir(pages) if f.endswith(".parquet")])
        assert n_files >= 3, "corpus must span several files for this test"

        # clean one-shot reference run (no checkpointing)
        clean_out = str(tmp_path_factory.mktemp("ckpt_clean"))
        summon_mod.summon(
            cfg, pages, clean_out, fetch=corpus_fetch(corpus), n_seen_shards=2, concurrency=1
        )
        clean = pq.read_table(os.path.join(clean_out, "results", "run-0000")).to_pandas()

        # crashing run: die after the first group committed
        out = str(tmp_path_factory.mktemp("ckpt_resume"))
        real_write = summon_mod._write_group
        calls = {"n": 0}

        def crashing_write(ds, path):
            if calls["n"] >= 1:
                raise RuntimeError("injected crash between groups")
            calls["n"] += 1
            real_write(ds, path)

        monkeypatch.setattr(summon_mod, "_write_group", crashing_write)
        with pytest.raises(RuntimeError, match="injected crash"):
            summon_mod.summon(
                cfg, pages, out, fetch=corpus_fetch(corpus),
                n_seen_shards=2, concurrency=1, checkpoint_groups=3,
            )
        monkeypatch.setattr(summon_mod, "_write_group", real_write)

        ckpts = [json.loads(l) for l in open(os.path.join(out, "checkpoints.jsonl"))]
        assert len(ckpts) == 1  # exactly the committed group

        # the committed group's output files before the resume: the
        # resume must not rewrite a single byte of them (skipped WHOLE,
        # not recomputed-and-overwritten — manifest accounting alone
        # could lie about that)
        import glob as _glob

        committed_dir = ckpts[0]["dir"]
        pre = {
            p: (os.path.getmtime(p), os.path.getsize(p))
            for p in _glob.glob(os.path.join(committed_dir, "**", "*.parquet"), recursive=True)
        } if committed_dir else {}

        # resume: committed group skipped, the rest re-run
        m2 = summon_mod.summon(
            cfg, pages, out, fetch=corpus_fetch(corpus),
            n_seen_shards=2, concurrency=1, checkpoint_groups=3, resume=True,
        )
        assert m2["groups_skipped"] == 1
        post = {
            p: (os.path.getmtime(p), os.path.getsize(p))
            for p in _glob.glob(os.path.join(committed_dir, "**", "*.parquet"), recursive=True)
        } if committed_dir else {}
        assert pre == post, "resume rewrote files of an already-committed group"
        # a group whose rows are all dropped by the frontier (the corpus
        # v6 mirror tail is sitemap-less) checkpoints with no output dir
        assert m2["checkpoint_groups"] >= 3
        assert 0 < len(m2["group_dirs"]) <= m2["checkpoint_groups"]

        parts = [rd.read_parquet(d).to_pandas() for d in m2["group_dirs"]]
        union = _pd.concat(parts, ignore_index=True)
        union["source"] = union["source"].astype(str)
        key = ["url", "doc_index"]
        a = clean.sort_values(key, ignore_index=True)
        b = union.sort_values(key, ignore_index=True)
        # row-for-row identical payloads (seen_first attribution may pick a
        # different same-sha row between runs; the invariant below pins it)
        for col in ("url", "doc_index", "jsonld", "sha", "object_name"):
            assert list(a[col]) == list(b[col]), col
        # exactly one first-writer per distinct sha in both runs
        for df in (a, b):
            firsts = df[df.sha != ""].groupby("sha")["seen_first"].sum()
            assert (firsts == 1).all()
        # object stores hold the same object BODIES: one object per
        # distinct sha in both runs. The source prefix of a sha shared
        # across sources follows first-writer attribution, which is
        # timing-dependent (same as the reference's StatObject-then-Put
        # race) — so compare by basename, not full path.
        clean_objs = self._summoned_objects(clean_out)
        resumed_objs = self._summoned_objects(out)
        # a sha that exists in exactly ONE source has no attribution race:
        # its full relative path (source prefix included) must match
        # between the clean and resumed runs — a run that filed every
        # object under the wrong source would fail here. Only shas shared
        # ACROSS sources are compared by basename.
        sha_nsrc = clean[clean.sha != ""].groupby("sha")["source"].nunique()
        single_src = set(sha_nsrc[sha_nsrc == 1].index)

        def _sha_of(path):
            return os.path.splitext(os.path.basename(path))[0]

        assert {p for p in clean_objs if _sha_of(p) in single_src} == {
            p for p in resumed_objs if _sha_of(p) in single_src
        }
        assert {os.path.basename(p) for p in clean_objs} == {
            os.path.basename(p) for p in resumed_objs
        }
        assert len(clean_objs) == len(resumed_objs)
        # per-source metrics of the resumed run cover the union
        assert sum(v["fetched"] for v in m2["per_source"].values()) == int(
            (clean.doc_index <= 0).sum()
        )


class TestAliasCollapse:
    def test_two_join_fallback_matches_broadcast(self, ray_session):
        # fold_cap=0 forces the beyond-cap path for BOTH side tables
        # (canonical falls through fold_or_reduce to the distributed
        # groupby-Min; the redirect table is joined instead of pulled).
        # Before round 5 the beyond-cap canonical side silently became
        # empty — this pins the documented two-left-join composition.
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import alias_collapse

        canon = '<html><head><link rel="canonical" href="https://h.example/canon"></head></html>'
        redir = '<meta http-equiv="refresh" content="0; url=https://h.example/mid">'
        mid = '<meta http-equiv="refresh" content="0; url=https://h.example/plain">'
        pages = rd.from_pandas(
            pd.DataFrame(
                {
                    "url": [
                        "https://h.example/start",  # 2-hop redirect -> /plain
                        "https://h.example/mid",  # 1-hop redirect -> /plain
                        "https://h.example/decl",  # declares canonical
                        "https://h.example/plain",  # plain page
                    ],
                    "html": [redir.encode(), mid.encode(), canon.encode(), b"<html>x</html>"],
                }
            )
        ).repartition(2)
        fast = alias_collapse(pages).to_pandas().sort_values("url", ignore_index=True)
        slow = (
            alias_collapse(pages, fold_cap=0)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        pd.testing.assert_frame_equal(fast, slow[fast.columns], check_dtype=False)
        got = fast.set_index("url")["alias"]
        assert got["https://h.example/start"] == "https://h.example/plain"
        assert got["https://h.example/mid"] == "https://h.example/plain"
        assert got["https://h.example/decl"] == "https://h.example/canon"
        assert got["https://h.example/plain"] == "https://h.example/plain"


class TestChangeDetect:
    def test_classification_and_rate(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import change_detect

        ts = pd.Timestamp("2026-01-01")
        a = rd.from_pandas(
            pd.DataFrame(
                {
                    "url": [
                        "https://h1.example/p/1",  # unchanged
                        "https://h1.example/p/2",  # changed
                        "https://h1.example/p/3",  # removed
                        "https://h2.example/p/1",  # unchanged
                    ],
                    "warc_ts": [ts] * 4,
                    "html": [b"same1", b"old", b"gone", b"same2"],
                }
            )
        )
        b = rd.from_pandas(
            pd.DataFrame(
                {
                    "url": [
                        "https://h1.example/p/1",
                        "https://h1.example/p/2",
                        "https://h2.example/p/1",
                        "https://h2.example/p/9",  # added
                    ],
                    "warc_ts": [ts] * 4,
                    "html": [b"same1", b"new", b"same2", b"fresh"],
                }
            )
        )
        got = change_detect(a, b).to_pandas().set_index("host")
        h1 = got.loc["h1.example"]
        assert (
            int(h1.n_unchanged),
            int(h1.n_changed),
            int(h1.n_added),
            int(h1.n_removed),
        ) == (1, 1, 0, 1)
        assert h1.change_rate == 0.5
        h2 = got.loc["h2.example"]
        assert (
            int(h2.n_unchanged),
            int(h2.n_changed),
            int(h2.n_added),
            int(h2.n_removed),
        ) == (1, 0, 1, 0)
        assert h2.change_rate == 0.0

    def test_priority_update_buckets_and_unknown_default(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import priority_update

        rates = pd.DataFrame(
            {
                "host": ["cold.example", "hot.example", "warm.example"],
                "change_rate": [0.01, 0.5, 0.15],
            }
        )
        frontier = rd.from_items(
            [
                {"url": "https://hot.example/a"},
                {"url": "https://warm.example/b"},
                {"url": "https://cold.example/c"},
                {"url": "https://new.example/d"},  # no history -> 1
            ]
        )
        got = priority_update(frontier, rates).to_pandas().set_index("host")
        assert int(got.loc["hot.example", "priority"]) == 0
        assert int(got.loc["warm.example", "priority"]) == 1
        assert int(got.loc["cold.example", "priority"]) == 2
        assert int(got.loc["new.example", "priority"]) == 1

    @pytest.mark.parametrize("seed", [3, 11, 42])
    def test_change_detect_randomized_parity(self, ray_session, seed):
        # randomized snapshots vs an independent pandas reference:
        # exercises the blob-bucket exchange with many batches, hosts,
        # and all four fates mixed per host
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import change_detect

        rng = np.random.default_rng(seed)
        n, hosts = 3000, ["h%d.example" % i for i in range(7)]
        ts = pd.Timestamp("2026-01-01")
        urls = ["https://%s/p/%d" % (hosts[i % 7], i) for i in range(n)]
        html_a = [b"body-%d" % i for i in range(n)]
        fate = rng.integers(0, 4, n)  # 0 unchanged, 1 changed, 2 removed, 3 also-spawn
        a = pd.DataFrame({"url": urls, "warc_ts": ts, "html": html_a})
        keep = fate != 2
        html_b = [
            h + b"!" if f == 1 else h for h, f in zip(html_a, fate)
        ]
        b = pd.DataFrame(
            {"url": np.array(urls)[keep], "warc_ts": ts, "html": np.array(html_b, dtype=object)[keep]}
        )
        spawn = fate == 3
        b = pd.concat(
            [
                b,
                pd.DataFrame(
                    {
                        "url": [u + "?new" for u, s in zip(urls, spawn) if s],
                        "warc_ts": ts,
                        "html": [b"fresh-%d" % i for i, s in enumerate(spawn) if s],
                    }
                ),
            ],
            ignore_index=True,
        )
        # both dispatch paths: default (broadcast diff) and forced
        # bucket exchange (broadcast_urls=0) must agree with the
        # reference AND with each other
        got = (
            change_detect(
                rd.from_pandas(a).repartition(9),
                rd.from_pandas(b).repartition(7),
                num_buckets=16,
            )
            .to_pandas()
            .set_index("host")
        )
        got_bucket = (
            change_detect(
                rd.from_pandas(a).repartition(9),
                rd.from_pandas(b).repartition(7),
                num_buckets=16,
                broadcast_urls=0,
            )
            .to_pandas()
            .set_index("host")
        )
        cols = ["n_unchanged", "n_changed", "n_added", "n_removed", "change_rate"]
        pd.testing.assert_frame_equal(
            got[cols].sort_index(), got_bucket[cols].sort_index(), check_dtype=False
        )
        hs = pd.Series([u.split("/")[2] for u in urls])
        for h in hosts:
            m = (hs == h).to_numpy()
            assert int(got.loc[h, "n_unchanged"]) == int(((fate != 1) & (fate != 2) & m).sum())
            assert int(got.loc[h, "n_changed"]) == int(((fate == 1) & m).sum())
            assert int(got.loc[h, "n_removed"]) == int(((fate == 2) & m).sum())
            assert int(got.loc[h, "n_added"]) == int(((fate == 3) & m).sum())

    def test_host_stats_mirror_detection(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import host_stats

        ts = pd.Timestamp("2026-01-01")
        rows = [
            # mirror: 5 urls, ONE body
            *[
                {
                    "url": "https://mirror.example/p/%d" % i,
                    "warc_ts": ts + pd.Timedelta(seconds=i),
                    "html": b"same-body",
                }
                for i in range(5)
            ],
            # normal host: 3 urls, 3 bodies
            *[
                {
                    "url": "https://real.example/p/%d" % i,
                    "warc_ts": ts,
                    "html": b"body-%d" % i,
                }
                for i in range(3)
            ],
        ]
        got = host_stats(rd.from_items(rows).repartition(3)).set_index("host")
        assert int(got.loc["mirror.example", "n_pages"]) == 5
        assert int(got.loc["mirror.example", "n_distinct"]) == 1
        assert int(got.loc["mirror.example", "span_s"]) == 4
        assert int(got.loc["real.example", "n_distinct"]) == 3
        assert int(got.loc["real.example", "span_s"]) == 0

    def test_recrawl_snapshot_deterministic(self, ray_session):
        import ray.data as rd

        from gleaner_ray.pipelines.recrawl import recrawl_snapshot
        from gleaner_ray.sources import synth

        corpus = synth.generate_corpus("/root/testdata/sf0.001")
        import os

        pages = rd.read_parquet(os.path.join(corpus, "pages"))
        b1 = recrawl_snapshot(pages).to_pandas().sort_values("url", ignore_index=True)
        b2 = recrawl_snapshot(pages).to_pandas().sort_values("url", ignore_index=True)
        assert b1.equals(b2)
        # the fate rule actually exercises every class on this corpus
        a_urls = set(pages.to_pandas()["url"])
        b_urls = set(b1["url"])
        assert b_urls - a_urls, "no added URLs"
        assert a_urls - b_urls, "no removed URLs"


class TestCorpusFromCrawl:
    def test_keep_first_by_url_and_token_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.summon import corpus_from_crawl

        df = pd.DataFrame(
            {
                "url": [
                    "https://b.example/2",
                    "https://a.example/1",
                    "https://c.example/3",
                    "https://d.example/4",
                ],
                "jsonld": ['{"a": 1}', '{"a": 1}', '{"b": 2 }', ""],
            }
        )
        got = (
            corpus_from_crawl(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .set_index("url")
            .sort_index()
        )
        # identical bytes: lexicographically-first url wins
        assert bool(got.loc["https://a.example/1", "keep"])
        assert not bool(got.loc["https://b.example/2", "keep"])
        # singletons always kept; whitespace token counts
        assert bool(got.loc["https://c.example/3", "keep"])
        assert got.loc["https://c.example/3", "n_tokens"] == 3
        assert got.loc["https://d.example/4", "n_tokens"] == 0

    def test_bucket_exchange_path_matches_broadcast(self, ray_session):
        # winner_cap=0 forces the beyond-cap digest-bucket exchange
        # whenever any duplicate exists; both paths must agree row for
        # row (VERDICT r4 item 3: the broadcast winner map is now
        # bounded, with this as the distributed fallback).
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.summon import corpus_from_crawl

        rng = np.random.RandomState(7)
        n = 300
        bodies = ['{"v": %d}' % v for v in rng.randint(0, 60, size=n)]  # heavy dup
        df = pd.DataFrame(
            {
                "url": ["https://h%d.example/p%03d" % (i % 9, i) for i in range(n)],
                "jsonld": bodies,
            }
        )
        ds = rd.from_pandas(df).repartition(5)
        fast = (
            corpus_from_crawl(ds)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        slow = (
            corpus_from_crawl(ds, winner_cap=0, num_buckets=16)
            .to_pandas()
            .sort_values("url", ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            fast, slow[fast.columns], check_dtype=False
        )
        # exactly one keeper per distinct body, and it is the min url
        fast["h"] = df.set_index("url").loc[fast["url"], "jsonld"].to_numpy()
        keepers = fast[fast["keep"]].groupby("h")["url"].agg(["count", "min"])
        assert (keepers["count"] == 1).all()
        first = fast.groupby("h")["url"].min()
        assert (keepers["min"] == first.loc[keepers.index]).all()

    def test_bucket_exchange_edge_cases(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gleaner_ray.pipelines.summon import corpus_from_crawl

        # empty input through the fallback path (winner_cap=0 with zero
        # dups still broadcasts; cap=-1 forces the exchange outright)
        empty = pd.DataFrame(
            {"url": pd.Series(dtype=object), "jsonld": pd.Series(dtype=object)}
        )
        out = corpus_from_crawl(rd.from_pandas(empty), winner_cap=-1).to_pandas()
        # zero rows; schema may be empty (no groups ever form, so the
        # exchange's map_groups never runs — same as the broadcast path
        # over a zero-block dataset)
        assert len(out) == 0
        # all-unique input: every row is its own keeper on the exchange path
        uniq = pd.DataFrame(
            {
                "url": [f"https://u/{i}" for i in range(10)],
                "jsonld": ['{"i": %d}' % i for i in range(10)],
            }
        )
        out2 = corpus_from_crawl(
            rd.from_pandas(uniq), winner_cap=-1, num_buckets=4
        ).to_pandas()
        assert len(out2) == 10 and bool(out2["keep"].all())
