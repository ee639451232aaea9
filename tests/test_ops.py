"""Behavioral tests for the training-data operators: planted duplicates
must be found, the IVF path must approximate brute force, the stubbed
codec boundary must behave as documented."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    import ray.data as rd

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away into the green forest "
        "while the hunter watches quietly from a distance near the old wooden bridge by the river"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("green", "dark")},  # near-dup of 1
        {"doc_id": 3, "text": base},  # exact dup of 1
        {"doc_id": 4, "text": "completely different content about ray data pipelines and arrow batches " * 3},
        {"doc_id": 5, "text": "yet another unrelated document discussing cuckoo filters and minhash sketches " * 3},
    ]
    return rd.from_items(rows)


class TestNearDup:
    @pytest.mark.slow
    def test_minhash_lsh_finds_planted_pairs(self, docs_with_dups):
        from gleaner_ray.ops.dedup import minhash_lsh

        pairs = set(map(tuple, minhash_lsh(docs_with_dups).to_pandas()[["a", "b"]].values))
        assert (1, 3) in pairs  # exact dup always collides
        assert (1, 2) in pairs or (2, 3) in pairs  # near-dup found
        assert not any(4 in p or 5 in p for p in pairs)

    @pytest.mark.slow
    def test_jaccard_verification(self, docs_with_dups):
        from gleaner_ray.ops.dedup import minhash_lsh, ngram_jaccard_pairs

        cand = minhash_lsh(docs_with_dups)
        verified = ngram_jaccard_pairs(docs_with_dups, cand, threshold=0.99).to_pandas()
        pairs = set(map(tuple, verified[["a", "b"]].values)) if len(verified) else set()
        assert (1, 3) in pairs  # identical text -> jaccard 1.0
        # near-dup (one word changed) is below 0.99
        assert (1, 2) not in pairs

    @pytest.mark.slow
    def test_ngram_jaccard_dedup_exact(self, docs_with_dups):
        from gleaner_ray.ops.dedup import ngram_jaccard_dedup

        df = ngram_jaccard_dedup(docs_with_dups, threshold=0.99).to_pandas()
        pairs = set(map(tuple, df[["a", "b"]].values))
        assert (1, 3) in pairs
        assert df[(df.a == 1) & (df.b == 3)].jaccard.iloc[0] == 1.0
        assert (1, 2) not in pairs  # below 0.99
        lo = ngram_jaccard_dedup(docs_with_dups, threshold=0.5).to_pandas()
        lo_pairs = set(map(tuple, lo[["a", "b"]].values))
        assert (1, 2) in lo_pairs  # one-word change is well above 0.5

    @pytest.mark.slow
    def test_simhash_finds_planted_pairs(self, docs_with_dups):
        from gleaner_ray.ops.dedup import simhash_dedup

        df = simhash_dedup(docs_with_dups).to_pandas()
        pairs = set(map(tuple, df[["a", "b"]].values))
        assert (1, 3) in pairs
        assert df[(df.a == 1) & (df.b == 3)].hamming.iloc[0] == 0

    def test_repetition_scores(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import repetition_scores

        rows = [
            {"doc_id": 1, "text": "a b\na b\nc d"},  # 1 dup line of 3
            {"doc_id": 2, "text": "x y x y x y"},  # 'x y' dominates 2-grams
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "all distinct lines\nno repeats here\nok"},
        ]
        df = (
            rd.from_items(rows)
            .map_batches(repetition_scores, batch_format="pandas")
            .to_pandas()
            .set_index("doc_id")
        )
        assert df.loc[1, "dup_line_frac"] == pytest.approx(1 / 3)
        assert df.loc[1, "dup_line_char_frac"] == pytest.approx(6 / 9)
        # 'x y x y x y': 2-grams = xy yx xy yx xy -> top 3/5
        assert df.loc[2, "top_2gram_frac"] == pytest.approx(3 / 5)
        assert (df.loc[3] == 0.0).all()
        assert df.loc[4, "dup_line_frac"] == 0.0

    @pytest.mark.slow
    def test_minhash_jaccard_dedup_composed(self, docs_with_dups):
        from gleaner_ray.ops.dedup import minhash_jaccard_dedup, ngram_jaccard_dedup

        got = minhash_jaccard_dedup(docs_with_dups, threshold=0.5).to_pandas()
        want = ngram_jaccard_dedup(docs_with_dups, threshold=0.5).to_pandas()
        gp = set(map(tuple, got[["a", "b"]].values))
        wp = set(map(tuple, want[["a", "b"]].values))
        # recall-1 sketch params: composed output equals the exact answer
        assert gp == wp and (1, 2) in gp and (1, 3) in gp

    @pytest.mark.slow
    def test_simhash_jaccard_dedup_composed(self, docs_with_dups):
        from gleaner_ray.ops.dedup import ngram_jaccard_dedup, simhash_jaccard_dedup

        got = simhash_jaccard_dedup(docs_with_dups, threshold=0.5).to_pandas()
        want = ngram_jaccard_dedup(docs_with_dups, threshold=0.5).to_pandas()
        assert set(map(tuple, got[["a", "b"]].values)) == set(map(tuple, want[["a", "b"]].values))

    @pytest.mark.slow
    def test_embedding_near_dup_planted(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import embedding_near_dup

        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((50, 16)).astype(np.float32)
        vecs[7] = vecs[3] + 0.001  # planted near-dup
        ds = rd.from_items([{"vec_id": i, "embedding": list(map(float, v))} for i, v in enumerate(vecs)])
        pairs = set(map(tuple, embedding_near_dup(ds, threshold=0.99).to_pandas()[["a", "b"]].values))
        assert (3, 7) in pairs

    @pytest.mark.slow
    def test_ngram_max_df_bounds_stopword_joins(self, ray_session):
        # stopword-heavy corpus: every doc shares the same filler
        # shingles; with max_df the filler is dropped from the inverted
        # index (bounded join size) while a planted near-dup pair that
        # shares RARE shingles is still found
        import ray.data as rd

        from gleaner_ray.ops.dedup import NGRAM_SCALE_MAX_DF, ngram_jaccard_dedup

        stop = "the of and a to in is it that on for as with was at " * 4
        rare = "peculiar osprey nesting survey in the tidal marsh of cascadia region nine"
        rows = [{"doc_id": i, "text": stop} for i in range(20)]
        rows.append({"doc_id": 100, "text": rare})
        rows.append({"doc_id": 101, "text": rare.replace("nine", "ten")})
        ds = rd.from_items(rows)
        got = ngram_jaccard_dedup(ds, threshold=0.5, max_df=5).to_pandas()
        pairs = set(map(tuple, got[["a", "b"]].values))
        # the planted rare-shingle pair survives the prefix filter
        assert (100, 101) in pairs
        # stopword-only docs share ONLY df>max_df shingles -> no pairs
        assert not any(a < 100 for a, _ in pairs)
        # the auto preset resolves to the documented constant and runs
        auto = ngram_jaccard_dedup(ds, threshold=0.5, max_df="auto").to_pandas()
        assert NGRAM_SCALE_MAX_DF == 512  # documented bound: <=512^2 rows/shingle
        assert (100, 101) in set(map(tuple, auto[["a", "b"]].values))

    @pytest.mark.slow
    def test_lsh_candidate_recall_precondition(self, ray_session):
        # The driver oracles for dedup_minhash_lsh / dedup_simhash reuse
        # the exact all-pairs SQL, which is valid ONLY while candidate
        # recall is 1.0 at the shipped parameters. Assert the
        # precondition directly (candidates ⊇ exact pairs) on the real
        # sf0.001 documents table, so parameter or data drift fails here
        # with a clear message instead of an opaque oracle diff.
        import ray.data as rd

        from gleaner_ray.ops.dedup import minhash_lsh, ngram_jaccard_dedup, simhash_dedup

        docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        exact = ngram_jaccard_dedup(docs, threshold=0.8).to_pandas()
        exact_pairs = set(map(tuple, exact[["a", "b"]].values))
        assert exact_pairs, "fixture corpus lost its planted near-dups"
        mh = set(map(tuple, minhash_lsh(docs).to_pandas()[["a", "b"]].values))
        missing = exact_pairs - mh
        assert not missing, (
            "minhash-LSH candidate recall < 1.0 at shipped params; the "
            "all-pairs oracle for dedup_minhash_lsh is no longer valid: %s" % missing
        )
        sh = set(
            map(
                tuple,
                simhash_dedup(docs, bands=8, max_hamming=16).to_pandas()[["a", "b"]].values,
            )
        )
        missing = exact_pairs - sh
        assert not missing, (
            "simhash candidate recall < 1.0 at shipped params; the "
            "all-pairs oracle for dedup_simhash is no longer valid: %s" % missing
        )

    @pytest.mark.slow
    def test_embedding_lsh_recall_precondition(self, ray_session):
        # same precondition for dedup_embedding_lsh: the bucketed path's
        # candidates must cover every exact cos>=0.25 pair at the
        # shipped (n_planes=2, seeds=100..139) parameters
        import ray.data as rd

        from gleaner_ray.ops.dedup import embedding_near_dup

        embs = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = embedding_near_dup(embs, threshold=0.25, n_planes=0).to_pandas()
        lsh = embedding_near_dup(
            embs, threshold=0.25, n_planes=2, seeds=tuple(range(100, 140))
        ).to_pandas()
        exact_pairs = set(map(tuple, exact[["a", "b"]].values))
        lsh_pairs = set(map(tuple, lsh[["a", "b"]].values))
        assert exact_pairs, "fixture corpus lost its cos>=0.25 pairs"
        missing = exact_pairs - lsh_pairs
        assert not missing, (
            "embedding-LSH recall < 1.0 at shipped params; the exact "
            "oracle for dedup_embedding_lsh is no longer valid: %d missing" % len(missing)
        )

    @pytest.mark.slow
    def test_ngram_top_k_counts(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import ngram_top_k

        rows = [
            {"doc_id": 1, "text": "a b a b c"},   # bigrams: ab ba ab bc
            {"doc_id": 2, "text": "a b"},          # ab
            {"doc_id": 3, "text": "x"},            # too short
            {"doc_id": 4, "text": ""},
        ]
        df = ngram_top_k(rd.from_items(rows), n=2, k=3)
        assert df["ngram"].iloc[0] == "a b"  # most frequent bigram first
        top = dict(zip(df["ngram"], df["cnt"]))
        assert top["a b"] == 3 and top["b a"] == 1 and top["b c"] == 1
        # cross-document windows are never counted ("c a" from doc1->doc2)
        assert "c a" not in top and len(df) == 3
        # forced distributed-reduce fallback (driver_grams=0) agrees
        # with the driver-fold path row for row
        df_dist = ngram_top_k(rd.from_items(rows), n=2, k=3, driver_grams=0)
        assert df.equals(df_dist)

    @pytest.mark.slow
    def test_phrase_detect_tier_parity(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import phrase_detect

        rows = [
            {"doc_id": 1, "text": "a b a c"},  # bigrams: "a b" "b a" "a c"
            {"doc_id": 2, "text": "b a a"},    # bigrams: "b a" "a a"
        ]
        # 3 distinct unigrams, 4 distinct bigrams: driver_vocab=3 folds
        # the unigram vocab but overflows the bigram table (tier 2);
        # driver_vocab=0 overflows both (tier 3 distributed joins)
        def run(**kw):
            out = phrase_detect(
                rd.from_items(rows), min_count=1, delta=0, threshold=1, **kw
            ).to_pandas()
            return out.sort_values("bigram", ignore_index=True)

        t1 = run()                  # tier 1: full driver fold
        t2 = run(driver_vocab=3)    # tier 2: broadcast-vocab actor score
        t3 = run(driver_vocab=0)    # tier 3: two-join fallback
        assert list(t1["bigram"]) == ["a a", "a b", "a c", "b a"]
        # exact word2phrase decision: (c_ab - 0) * N >= 1 * c_a * c_b, N=7
        got = dict(zip(t1["bigram"], t1["is_phrase"]))
        assert got == {"a a": False, "a b": False, "a c": True, "b a": True}
        for other in (t2, t3):
            pd_sorted = other[t1.columns]
            assert t1.equals(pd_sorted), f"tier mismatch:\n{t1}\nvs\n{pd_sorted}"

    def test_novelty_scores(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import novelty_scores

        bench = rd.from_items(
            [{"doc_id": 0, "text": "the secret benchmark question about turtles and rivers"}]
        )
        corpus = rd.from_items(
            [
                # shares exactly the 5-shingles covering "the secret
                # benchmark question about turtles" (2 of its 4 shingles)
                {"doc_id": 10, "text": "zz yy the secret benchmark question about turtles"},
                {"doc_id": 11, "text": "completely unrelated corpus document with many words"},
                {"doc_id": 12, "text": ""},  # no shingles -> novelty 1.0
            ]
        )
        out = (
            novelty_scores(corpus, bench)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # doc 10: 8 tokens -> 4 distinct shingles, windows 3 and 4 match
        assert out.loc[10, "n_shingles"] == 4 and out.loc[10, "n_hit"] == 2
        assert out.loc[10, "novelty"] == 0.5
        assert out.loc[11, "n_hit"] == 0 and out.loc[11, "novelty"] == 1.0
        assert out.loc[12, "n_shingles"] == 0 and out.loc[12, "novelty"] == 1.0

    def test_cross_corpus_dedup_paths_agree(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import cross_corpus_dedup

        ref = rd.from_items(
            [
                {"doc_id": 0, "text": "already in the old snapshot"},
                {"doc_id": 1, "text": "also old content"},
            ]
        )
        corpus = rd.from_items(
            [
                {"doc_id": 10, "text": "already in the old snapshot"},  # dup
                {"doc_id": 11, "text": "brand new document"},
                {"doc_id": 12, "text": ""},
            ]
        )

        def run(**kw):
            return (
                cross_corpus_dedup(corpus, ref, **kw)
                .to_pandas()
                .sort_values("doc_id", ignore_index=True)
            )

        bcast = run()                  # broadcast probe path
        joined = run(broadcast_cap=0)  # forced left_outer join fallback
        assert list(bcast["is_new"]) == [False, True, True]
        assert bcast[["doc_id", "h", "is_new"]].equals(joined[["doc_id", "h", "is_new"]])

    def test_decontaminate_flags_overlap(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import decontaminate

        bench = rd.from_items(
            [{"doc_id": 0, "text": "the secret benchmark question about turtles and rivers"}]
        )
        corpus = rd.from_items(
            [
                # contains a full 5-shingle of the benchmark
                {"doc_id": 10, "text": "intro text the secret benchmark question about turtles end"},
                {"doc_id": 11, "text": "completely unrelated corpus document with many words"},
                {"doc_id": 12, "text": ""},
            ]
        )
        got = (
            decontaminate(corpus, bench, shingle_k=5)
            .to_pandas()
            .set_index("doc_id")["contaminated"]
        )
        assert bool(got[10]) and not bool(got[11]) and not bool(got[12])

    def test_decontaminate_bloom_no_false_negatives(self, ray_session):
        # Bloom decontamination has ONE-SIDED error: every doc the exact
        # path flags must be flagged by the Bloom path (a false positive
        # only discards a clean doc).  Pin the superset property — and,
        # at the shipped bits_log2 on the real sf0.01 documents table,
        # exact equality, which is the precondition for reusing the
        # exact SQL oracle for text_decontaminate_bloom (same contract
        # as the LSH recall-1 tests above).
        import ray.data as rd

        from gleaner_ray.ops.dedup import decontaminate, decontaminate_bloom

        docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet")
        bench = docs.map_batches(
            lambda df: df[df["doc_id"] < 20], batch_format="pandas"
        )
        exact = (
            decontaminate(docs, bench).to_pandas().set_index("doc_id")["contaminated"]
        )
        bloom = (
            decontaminate_bloom(docs, bench)
            .to_pandas()
            .set_index("doc_id")["contaminated"]
        )
        exact = exact.sort_index()
        bloom = bloom.sort_index()
        assert not (exact & ~bloom).any(), "Bloom path dropped an exact hit"
        assert exact.equals(bloom), (
            "Bloom false positives at shipped bits_log2 on sf0.01; the "
            "exact oracle for text_decontaminate_bloom is no longer valid"
        )
        # tiny-filter sanity: heavy saturation still never drops a hit
        small = (
            decontaminate_bloom(docs, bench, bits_log2=12)
            .to_pandas()
            .set_index("doc_id")["contaminated"]
            .sort_index()
        )
        assert not (exact & ~small).any()

    def test_decontaminate_fuzzy_semantics(self, ray_session):
        # fuzzy decontamination flags near-DUPLICATES of a bench doc,
        # not any doc sharing a single shingle (the differentiator vs
        # the exact-overlap path)
        import ray.data as rd

        from gleaner_ray.ops.dedup import decontaminate, decontaminate_fuzzy

        bench_text = "the secret benchmark question about turtles and rivers in spring"
        bench = rd.from_items([{"doc_id": 0, "text": bench_text}])
        corpus = rd.from_items(
            [
                # near-duplicate of the bench doc (one word changed)
                {"doc_id": 10, "text": bench_text.replace("spring", "autumn")},
                # shares ONE 5-shingle but is mostly different text
                {
                    "doc_id": 11,
                    "text": "the secret benchmark question about weather "
                    "and many other unrelated filler words appear here now",
                },
                {"doc_id": 12, "text": "completely unrelated corpus document"},
                {"doc_id": 13, "text": ""},
            ]
        )
        fuzzy = (
            decontaminate_fuzzy(corpus, bench, threshold=0.5)
            .to_pandas()
            .set_index("doc_id")["contaminated"]
        )
        exact = (
            decontaminate(corpus, bench)
            .to_pandas()
            .set_index("doc_id")["contaminated"]
        )
        assert bool(fuzzy[10]) and not bool(fuzzy[11]) and not bool(fuzzy[12])
        assert not bool(fuzzy[13])
        # the exact path DOES flag the single-shingle doc — fuzzy is a
        # strict refinement on this fixture
        assert bool(exact[11])

    def test_fuzzy_decontaminate_recall_precondition(self, ray_session):
        # The driver oracle for text_decontaminate_fuzzy is the exact
        # all-pairs Jaccard-vs-benchmark SQL, valid ONLY while LSH
        # candidate recall is 1.0 at the shipped parameters. Pin it:
        # the sketch->verify output must EQUAL the exact brute-force
        # flag set on the real sf0.01 documents table.
        import ray.data as rd

        from gleaner_ray.ops.dedup import _shingle_hashes_batch, decontaminate_fuzzy

        docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet")
        bench = docs.map_batches(
            lambda df: df[df["doc_id"] < 20], batch_format="pandas"
        )
        got = (
            decontaminate_fuzzy(docs, bench)
            .to_pandas()
            .set_index("doc_id")["contaminated"]
            .sort_index()
        )
        # brute-force exact: jaccard of every doc against every bench doc
        pdf = docs.to_pandas().sort_values("doc_id", ignore_index=True)
        sh = [np.unique(s) for s in _shingle_hashes_batch(list(pdf["text"]))]
        bench_sets = [
            (int(i), s)
            for i, s in zip(pdf["doc_id"], sh)
            if int(i) < 20 and len(s)
        ]
        want = {}
        for i, s in zip(pdf["doc_id"], sh):
            flag = False
            if len(s):
                for _, bs in bench_sets:
                    inter = len(np.intersect1d(s, bs, assume_unique=True))
                    if inter and inter / (len(s) + len(bs) - inter) >= 0.8:
                        flag = True
                        break
            want[int(i)] = flag
        missing = {i for i, f in want.items() if f and not got[i]}
        extra = {i for i, f in want.items() if not f and got[i]}
        assert not missing, (
            "fuzzy-decontaminate LSH recall < 1.0 at shipped params; the "
            "exact oracle for text_decontaminate_fuzzy is no longer valid: %s"
            % sorted(missing)[:10]
        )
        assert not extra, "verify stage passed a sub-threshold pair: %s" % sorted(extra)[:10]
        assert any(want.values()), "fixture corpus lost its planted bench near-dups"

    def test_span_dedup_clean(self, ray_session):
        # global keep-first over 3-token windows: doc 0 keeps everything;
        # doc 1 repeats doc 0's first window (dropped) plus a fresh tail;
        # doc 2 is an exact dup of doc 0 -> cleaned to empty; intra-doc
        # repetition (doc 3) keeps only the first copy
        import ray.data as rd

        from gleaner_ray.ops.dedup import span_dedup_clean

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b c d e f",
                    "a b c x y z",
                    "a b c d e f",
                    "p q r p q r",
                ],
            }
        )
        got = (
            span_dedup_clean(rd.from_pandas(df).repartition(3), width=3)
            .to_pandas()
            .set_index("doc_id")["text_clean"]
            .sort_index()
        )
        assert got[0] == "a b c d e f"
        assert got[1] == "x y z"
        assert got[2] == ""
        assert got[3] == "p q r"

    @pytest.mark.slow
    def test_embedding_exact_mode_matches_lsh_superset(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import embedding_near_dup

        rng = np.random.default_rng(9)
        vecs = rng.standard_normal((40, 8)).astype(np.float64)
        vecs[11] = vecs[2] * 1.5  # exact cosine dup (scaled)
        ds = rd.from_items([{"vec_id": i, "embedding": list(v)} for i, v in enumerate(vecs)])
        exact = embedding_near_dup(ds, threshold=0.9, n_planes=0).to_pandas()
        lsh = embedding_near_dup(ds, threshold=0.9, n_planes=6).to_pandas()
        exact_pairs = set(map(tuple, exact[["a", "b"]].values))
        lsh_pairs = set(map(tuple, lsh[["a", "b"]].values))
        assert (2, 11) in exact_pairs
        assert lsh_pairs <= exact_pairs  # LSH finds a subset of exact


class TestSampling:
    @pytest.mark.slow
    def test_temperature_mix_exact_witness(self, ray_session):
        import hashlib

        import ray.data as rd

        from gleaner_ray.ops.sampling import temperature_mix

        rows = [{"doc_id": i, "source": "big" if i < 400 else "small"} for i in range(500)]
        out = (
            temperature_mix(rd.from_items(rows))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # smallest source keeps everything (keep_prob = sqrt(100/100) = 1)
        assert out.loc[out["source"] == "small", "keep"].all()
        # every decision equals the raw integer inequality u^2 * n_s < 2^80 * n_min
        n = {"big": 400, "small": 100}
        for r in out.itertuples():
            u = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:10], 16)
            assert r.keep == (u * u * n[r.source] < (1 << 80) * 100), r
        # thinning tracks sqrt(n_min/n_s) = 0.5 for the big source
        kept_big = int(out.loc[out["source"] == "big", "keep"].sum())
        assert 150 <= kept_big <= 250

    @pytest.mark.slow
    def test_source_mix_balance_planted(self, ray_session):
        import hashlib

        import ray.data as rd

        from gleaner_ray.ops.sampling import source_mix_balance

        # source "big" holds 4x the char budget of "small" -> rate 0.25
        rows = [{"doc_id": i, "source": "big", "n_chars": 100} for i in range(1600)]
        rows += [{"doc_id": 10_000 + i, "source": "small", "n_chars": 100} for i in range(400)]
        out = source_mix_balance(rd.from_items(rows).repartition(4)).to_pandas()
        # every small-source row survives (rate exactly 1.0, u < 1 always)
        assert (out.source == "small").sum() == 400
        # big-source kept set == the exact md5-coin prediction at rate .25
        expect = {
            i
            for i in range(1600)
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 4294967296.0
            < 40_000.0 / 160_000.0
        }
        got = set(out[out.source == "big"].doc_id)
        assert got == expect
        # and the budgets are roughly balanced after the downsample
        assert abs(len(expect) - 400) < 80

    @pytest.mark.slow
    def test_hash_split_deterministic_and_proportional(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import hash_split

        ds = rd.from_items([{"doc_id": i} for i in range(2000)])
        a = hash_split(ds, frac=0.8).to_pandas().sort_values("doc_id", ignore_index=True)
        b = hash_split(ds, frac=0.8).to_pandas().sort_values("doc_id", ignore_index=True)
        assert (a["split"] == b["split"]).all()  # stable across runs
        frac = (a["split"] == "train").mean()
        assert 0.75 < frac < 0.85

    def test_pack_sequences_boundaries(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import pack_sequences

        # 10 docs x 100 tokens, budget 300 -> packs of 3 docs
        rows = [{"doc_id": i, "text": " ".join(["w"] * 100)} for i in range(10)]
        df = (
            pack_sequences(rd.from_items(rows), budget=300, bucket_size=4)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert list(df["offset_tokens"]) == [i * 100 for i in range(10)]
        assert list(df["pack_id"]) == [i * 100 // 300 for i in range(10)]


class TestSimilarity:
    @pytest.mark.slow
    def test_ivf_recall_vs_bruteforce(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.similarity import ivf_knn, knn_bruteforce

        emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        head = emb.limit(3).take_all()
        qv = {"qids": [r["vec_id"] for r in head], "vectors": [list(r["embedding"]) for r in head]}
        brute = knn_bruteforce(emb, qv, k=10)
        approx = ivf_knn(emb, qv, k=10, n_centroids=8, n_probe=4)
        recalls = []
        for qid in qv["qids"]:
            b = set(brute[brute.qid == qid].vec_id)
            a = set(approx[approx.qid == qid].vec_id)
            recalls.append(len(a & b) / len(b))
        assert np.mean(recalls) >= 0.5  # probing half the cells

    def test_covariance_matches_numpy(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.embutil import covariance

        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((37, 5))
        ds = rd.from_items(
            [{"embedding": list(map(float, v))} for v in vecs]
        ).repartition(4)  # multiple blocks -> multiple moment partials folded
        out = covariance(ds).sort_values(["i", "j"]).reset_index(drop=True)
        expect = np.cov(vecs, rowvar=False, bias=True)  # population cov
        got = out["cov"].to_numpy().reshape(5, 5)
        assert out.shape == (25, 3)
        np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)

    def test_quantize_uint8_roundtrip(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.embutil import quantize_uint8

        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((50, 6)).astype(np.float32)
        vecs[:, 2] = 1.5  # constant dim -> q = 0 everywhere
        ds = rd.from_items(
            [{"vec_id": i, "embedding": [float(x) for x in v]} for i, v in enumerate(vecs)]
        ).repartition(3)  # bounds folded across several partials
        out = quantize_uint8(ds).to_pandas().sort_values("vec_id")
        q = np.stack(out["q"].to_numpy())
        assert q.shape == (50, 6) and q.dtype == np.uint8
        assert (q[:, 2] == 0).all()
        lo = vecs.min(axis=0).astype(np.float64)
        hi = vecs.max(axis=0).astype(np.float64)
        for d in (0, 1, 3, 4, 5):
            # dequantized value within half a quantization step
            deq = lo[d] + q[:, d].astype(np.float64) / 255.0 * (hi[d] - lo[d])
            assert np.abs(deq - vecs[:, d]).max() <= (hi[d] - lo[d]) / 255.0 * 0.5 + 1e-12
            assert q[:, d].min() == 0 and q[:, d].max() == 255  # bounds hit the rails

    def test_covariance_empty(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.embutil import covariance

        ds = rd.from_items([{"embedding": [0.0, 0.0]}]).filter(lambda r: False)
        out = covariance(ds)
        assert len(out) == 0 and list(out.columns) == ["i", "j", "cov"]

    @pytest.mark.slow
    def test_knn_quantized_recall_vs_float(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.similarity import knn_bruteforce, knn_quantized

        emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        head = emb.limit(3).take_all()
        qv = {"qids": [r["vec_id"] for r in head], "vectors": [list(r["embedding"]) for r in head]}
        brute = knn_bruteforce(emb, qv, k=10)
        quant = knn_quantized(emb, query_ids=qv["qids"], k=10)
        assert set(quant.columns) == {"qid", "vec_id", "score"}
        recalls = []
        for qid in qv["qids"]:
            b = set(brute[brute.qid == qid].vec_id)
            q = set(quant[quant.qid == qid].vec_id)
            recalls.append(len(q & b) / len(b))
        # 8-bit quantization preserves most of the float top-10
        assert np.mean(recalls) >= 0.6

    def test_pq_structure_and_self_retrieval(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.similarity import pq_codebooks, pq_knn

        emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = pq_codebooks(emb, m=2, k_sub=4, iters=2)
        dim = len(emb.take(1)[0]["embedding"])
        assert len(books) == 2 and all(b.shape == (4, dim // 2) for b in books)
        out = pq_knn(emb, query_ids=[0, 1], k=10, m=2, k_sub=4)
        assert list(out.columns) == ["qid", "vec_id", "adist"]
        assert set(out.qid) == {0, 1}
        for qid in (0, 1):
            sub = out[out.qid == qid]
            assert len(sub) == 10
            # adist is non-decreasing and ties are vec_id-ordered
            assert (sub.adist.diff().dropna() >= 0).all()
            # the query's own codes give the minimum LUT distance, so the
            # query lands in the top tie-group (equal-code members sorted
            # by vec_id); its adist equals the group minimum
            assert sub.adist.iloc[0] == sub[sub.vec_id == qid].adist.min()
            # only k_sub**m = 16 distinct distances exist corpus-wide
            assert sub.adist.nunique() <= 16

    def test_bruteforce_self_is_top1(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.similarity import knn_bruteforce

        emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        head = emb.limit(1).take_all()
        qv = {"qids": [head[0]["vec_id"]], "vectors": [list(head[0]["embedding"])]}
        out = knn_bruteforce(emb, qv, k=3)
        assert out.iloc[0]["vec_id"] == head[0]["vec_id"]  # cosine 1 with itself


class TestTextOps:
    def test_char_entropy_edge_cases(self):
        import math

        from gleaner_ray.ops.text import char_entropy

        docs = ["", "aaaa", "héllo wörld", "😀😀🎉 mix", "a\nb\tc", None, "x" * 500 + "y"]
        batch = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        out = char_entropy(batch)
        # empty / null / single-char-alphabet docs all score H = 0
        assert out.entropy_micro[0] == 0 and out.entropy_micro[5] == 0
        assert out.entropy_micro[1] == 0 and out.n_distinct[1] == 1
        # uniform 5-char doc: H = ln(5) exactly
        assert out.entropy_micro[4] == math.floor(math.log(5) * 1e6 + 0.5)
        # astral-plane emoji count as single codepoints
        assert out.n_chars[3] == 7 and out.n_distinct[3] == 6
        # near-uniform-1-char spam scores close to 0
        assert 0 < out.entropy_micro[6] < 20_000

    def test_gopher_quality_rules(self):
        from gleaner_ray.ops.text import gopher_quality

        words30 = ("the of " + "word " * 28).strip()  # 30 words, 2 stopwords
        docs = [
            "",  # empty -> everything 0, dropped (n_words < min)
            words30,  # passes every rule
            words30.replace("the of", "aa bb"),  # no stopwords -> dropped
            "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\nthe of plain",  # bullets
            "wait... the of... and so...",  # every line ends with ...
            "# # # # the of " + "w " * 24,  # symbol ratio 4/30 > 0.1
            None,
        ]
        out = gopher_quality(pd.DataFrame({"doc_id": range(len(docs)), "text": docs}))
        assert list(out.keep) == [False, True, False, False, False, False, False]
        # bullet doc: 9 of 10 lines start with '-' -> 0.9, at the bound
        assert out.bullet_line_frac[3] == 0.9 and out.n_words[3] == 21
        # ellipsis doc: its single line ends with '...' -> frac 1.0 > 0.3
        assert out.ellipsis_line_frac[4] == 1.0
        # '...' runs also count as symbols: 3 of 5 words -> 0.6
        assert out.symbol_ratio[4] == 0.6
        # stopword counting is exact token equality: 'the' and 'and'
        # count, 'of...' does not
        assert out.n_stopwords[4] == 2
        # '#' tokens carry no [a-z]: 4 of 30 words non-alpha
        assert out.alpha_word_frac[5] == 26 / 30 and out.symbol_ratio[5] == 4 / 30
        assert out.n_words[0] == 0 and out.mean_word_len[0] == 0.0

    def test_bpe_train_merge_semantics(self, ray_session):
        import duckdb
        import ray.data as rd

        from gleaner_ray.ops.text import bpe_train

        # 'aaab' x4 forces merge 0 = 'a a' applied left-to-right
        # (aaa -> (aa)a, NOT a(aa)); then 'aa a' wins round 1 inside
        # aaab; runs, adjacency and boundary safety all exercised
        rows = [
            {"doc_id": 0, "text": "aaab aaab"},
            {"doc_id": 1, "text": "aaab aaab xyxy"},
            {"doc_id": 2, "text": "ba xy"},
        ]
        out = bpe_train(rd.from_items(rows), merges=3)
        # round 0: 'a a' counts overlapping occurrences (2 per aaab) x4 = 8
        # round 1: 'aa a' and 'a b' tie at 4 -> lexicographic min 'a b' wins
        # round 2: aaab is now 'aa ab' -> pair 'aa ab' (4) beats 'x y' (3)
        assert out["pair"].tolist() == ["a a", "a b", "aa ab"]
        assert out["merged"].tolist() == ["aa", "ab", "aaab"]
        assert out["cnt"].tolist() == [8, 4, 4]
        # replace-semantics parity with the oracle device is pinned by
        # the same padded strings through DuckDB's replace()
        py = "  a  a  a  b  ".replace(" a  a ", " aa ")
        db = duckdb.sql("SELECT replace('  a  a  a  b  ', ' a  a ', ' aa ')").fetchone()[0]
        assert py == db == "  aa  a  b  "

    def test_chunk_windows_edges(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import chunk_windows

        rows = [
            {"doc_id": 0, "text": ""},  # empty -> no chunks
            {"doc_id": 1, "text": " ".join(f"t{i}" for i in range(10))},  # < size -> 1 chunk
            {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(64))},  # == size -> 1 chunk
            {"doc_id": 3, "text": " ".join(f"t{i}" for i in range(65))},  # size+1 -> 2 chunks
            {"doc_id": 4, "text": " ".join(f"t{i}" for i in range(96))},  # full overlap tail
            {"doc_id": 5, "text": None},
        ]
        out = chunk_windows(rd.from_items(rows), size=64, stride=32).to_pandas()
        got = out.groupby("doc_id").chunk_id.count().to_dict()
        assert got == {1: 1, 2: 1, 3: 2, 4: 2}
        last = out[(out.doc_id == 3) & (out.chunk_id == 1)].iloc[0]
        assert last.n_tokens == 33 and last.chunk_text.startswith("t32 ") and last.chunk_text.endswith("t64")
        # overlap: chunk 1 re-covers tokens [32, 96)
        c1 = out[(out.doc_id == 4) & (out.chunk_id == 1)].iloc[0]
        assert c1.n_tokens == 64 and c1.chunk_text.split()[0] == "t32"

    def test_normalize_text_pins_duckdb_semantics(self, ray_session):
        import duckdb
        import ray.data as rd

        from gleaner_ray.ops.text import normalize_text

        stress = [
            "École  FRANÇAISE",
            "İstanbul VE IRMAK",          # U+0130 full-vs-simple divergence
            "ΣΟΦΟΣ ΣΟΦΙΑΣ",              # final-sigma context rule
            "STRASSE ß  und\tmehr",
            "a b",                   # NBSP is NOT RE2 whitespace
            "\t mixed \n ws \r\f end ",
            "ligature ﬁle ＦＵＬＬ width",
            "ⰯꟀ post-utf8proc additions \U00010570",
            "",
        ]
        batch = pd.DataFrame({"doc_id": range(len(stress)), "text": stress})
        got = normalize_text(rd.from_items(batch.to_dict("records"))).to_pandas()
        con = duckdb.connect()
        con.register("documents", batch)
        want = con.execute(
            r"""SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(coalesce(text,''))),
                 '[\t\n\f\r ]+', ' ', 'g')) AS norm_text FROM documents ORDER BY doc_id"""
        ).df()
        assert got.sort_values("doc_id", ignore_index=True).equals(want)

    def test_langid_heuristic(self):
        from gleaner_ray.ops.text import LangId

        lid = LangId()
        batch = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox is one of the animals in the forest and it was fast",
                    "der schnelle braune Fuchs ist eines der Tiere und das ist gut so",
                    "",
                ],
            }
        )
        out = lid(batch)
        assert list(out.lang_pred) == ["en", "de", "und"]

    # one sentence per supported language; script-detected languages
    # (non-Latin) exercise the range layer, Latin ones the profiles
    LANG_SAMPLES = [
        ("the cat and the dog were in the house and it was warm", "en"),
        ("der hund und die katze sind nicht mit dem auto auf der strasse", "de"),
        ("les enfants sont dans la maison pour que les chats ne sortent pas", "fr"),
        ("los ninos juegan con las pelotas por la tarde para sus amigos", "es"),
        ("che cosa sono anche della citta per una come gli altri", "it"),
        ("uma casa não tem mais como os das outras para seu dono", "pt"),
        ("het huis van een man die niet met dat werk maar ook", "nl"),
        ("och att det som är på för med av inte alls", "sv"),
        ("og det er til af den som med har ikke noget", "da"),
        ("jest nie tylko przez jako oraz czy przy bardzo jednak tam", "pl"),
        ("bir ve bu ile çok daha ama gibi ancak veya zaman", "tr"),
        ("yang dan di dengan untuk tidak dari ini itu pada hari", "id"),
        ("este pentru care din sau fost sunt acest dar unde merge", "ro"),
        ("ja on ei että oli mutta myös kun sen hän sanoi", "fi"),
        ("привет мир это тест на русском языке сегодня", "ru"),
        ("これは日本語のテストです", "ja"),
        ("这是一个中文测试句子没有假名", "zh"),
        ("이것은 한국어 테스트 문장입니다", "ko"),
        ("هذا اختبار باللغة العربية", "ar"),
        ("αυτό είναι ένα ελληνικό κείμενο", "el"),
        ("זהו מבחן בשפה העברית", "he"),
        ("यह हिंदी में एक परीक्षण है", "hi"),
        ("นี่คือการทดสอบภาษาไทย", "th"),
        ("", "und"),
        ("12345 67890 !!!", "und"),
    ]

    def test_langid_multilingual(self):
        from gleaner_ray.ops.text import LangId

        lid = LangId()
        batch = pd.DataFrame(
            {
                "doc_id": range(len(self.LANG_SAMPLES)),
                "text": [t for t, _ in self.LANG_SAMPLES],
            }
        )
        out = lid(batch)
        assert list(out.lang_pred) == [want for _, want in self.LANG_SAMPLES]

    def test_langid_sql_oracle_parity(self):
        """The generated DuckDB oracle must agree with the engine on
        every supported language, not just the (English) corpus."""
        import duckdb

        import __ray_entry__ as contract
        from gleaner_ray.ops.text import LangId

        df = pd.DataFrame(
            {
                "doc_id": range(len(self.LANG_SAMPLES)),
                "text": [t for t, _ in self.LANG_SAMPLES],
            }
        )
        py = LangId()(df)
        sql = contract._langid_sql().replace("FROM documents", "FROM df")
        odf = duckdb.connect().execute(sql).fetchdf().sort_values("doc_id").reset_index(drop=True)
        assert list(py.lang_pred) == list(odf.lang_pred)

    def test_token_stats_and_quality(self):
        from gleaner_ray.ops.text import quality_scores, token_stats

        batch = pd.DataFrame({"doc_id": [1, 2], "text": ["a b  c", ""]})
        t = token_stats(batch)
        assert list(t.n_tokens_ws) == [3, 0]
        q = quality_scores(batch)
        assert q.n_chars.iloc[0] == 6 and q.punct_ratio.iloc[1] == 0.0

    def test_fingerprint_deterministic(self):
        from gleaner_ray.ops.text import fingerprints

        batch = pd.DataFrame({"doc_id": [1], "text": ["one two three four five"]})
        a = fingerprints(batch).fingerprint.iloc[0]
        b = fingerprints(batch).fingerprint.iloc[0]
        assert a == b and len(a) > 0


class TestMultimodal:
    def test_strict_mode_raises_at_codec_boundary(self):
        from gleaner_ray.ops.multimodal import MediaDecode

        dec = MediaDecode(kind="image", mode="strict")
        with pytest.raises(NotImplementedError, match="codec"):
            dec(pd.DataFrame({"media_id": [1], "payload": [b"xx"]}))

    def test_fake_decode_deterministic_shapes(self):
        from gleaner_ray.ops.multimodal import MediaDecode

        dec = MediaDecode(kind="image", mode="fake")
        out1 = dec(pd.DataFrame({"media_id": [1, 2], "payload": [b"aa", b"bb"]}))
        out2 = dec(pd.DataFrame({"media_id": [1, 2], "payload": [b"aa", b"bb"]}))
        assert list(out1.shape_) if "shape_" in out1 else list(out1["shape"]) == ["64x64x3", "64x64x3"]
        assert np.allclose(np.stack(out1.features), np.stack(out2.features))

    def test_video_frame_sample(self):
        from gleaner_ray.ops.multimodal import MediaDecode, frame_sample

        dec = MediaDecode(kind="video", mode="fake")
        decoded = dec._decode(b"payload")
        assert decoded.shape[0] == 8
        assert frame_sample(decoded, every=2).shape[0] == 4

    def test_resize_nn_exact_gather(self):
        from gleaner_ray.ops.multimodal import resize_nn

        img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
        out = resize_nn(img, (2, 3))
        assert out.shape == (2, 3, 3)
        # nearest-neighbor: every output pixel is SOME input pixel
        flat_in = img.reshape(-1, 3)
        for px in out.reshape(-1, 3):
            assert any((px == q).all() for q in flat_in)
        # identity resize returns the same array values
        assert (resize_nn(img, (4, 6)) == img).all()

    def test_resize_stage_row_contract(self):
        from gleaner_ray.ops.multimodal import MediaResize

        rz = MediaResize(mode="fake", out_size=(32, 32))
        out = rz(pd.DataFrame({"media_id": [1, 2], "payload": [b"aa", b"bb"]}))
        assert list(out["shape"]) == ["32x32x3", "32x32x3"]
        assert list(out["n_bytes"]) == [2, 2]
        assert all(len(f) == 32 for f in out["features"])

    def test_frame_sampler_counts(self):
        from gleaner_ray.ops.multimodal import FrameSampler

        fs = FrameSampler(mode="fake", every=3)
        out = fs(pd.DataFrame({"media_id": [1], "payload": [b"vid"]}))
        # 8 fake frames sampled every 3rd -> ceil(8/3) = 3
        assert list(out["n_frames"]) == [3]
        assert out["shape"][0] == "3x64x64x3"
        assert len(out["frame_means"][0]) == 3


class TestFuzzyDedupGraph:
    """connected_components / fuzzy_dedup_keep / chunk_dedup / kmeans."""

    def _cc_df(self, pairs, **kw):
        import ray.data as rd

        from gleaner_ray.ops.dedup import connected_components

        ds = rd.from_items([{"a": a, "b": b} for a, b in pairs])
        return (
            connected_components(ds, **kw)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    def test_cc_driver_path(self, ray_session):
        # chain 1-2-3, separate 5-6, plus a cross edge arriving late
        df = self._cc_df([(2, 3), (1, 2), (5, 6), (8, 9), (6, 9)])
        got = dict(zip(df["node"], df["component"]))
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 5, 9: 5}

    @pytest.mark.slow
    def test_cc_distributed_path(self, ray_session, monkeypatch):
        # force the min-label-propagation branch on a tiny graph
        import gleaner_ray.ops.dedup as dd

        monkeypatch.setattr(dd, "_SMALL_PAIRSET", 0)
        df = self._cc_df([(2, 3), (1, 2), (5, 6), (8, 9), (6, 9)])
        got = dict(zip(df["node"], df["component"]))
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 5, 9: 5}

    @pytest.mark.slow
    def test_cc_long_chain_pointer_doubling(self, ray_session, monkeypatch):
        # a 40-node path graph needs ~log2(40) doubling rounds, far fewer
        # than 40 plain-propagation rounds; max_iters=8 proves doubling
        import gleaner_ray.ops.dedup as dd

        monkeypatch.setattr(dd, "_SMALL_PAIRSET", 0)
        df = self._cc_df([(i, i + 1) for i in range(40)], max_iters=8)
        assert (df["component"] == 0).all()
        assert len(df) == 41

    def test_cc_empty(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import connected_components

        ds = rd.from_pandas(
            pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        )
        assert connected_components(ds).count() == 0

    def test_fuzzy_keep_flags(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import fuzzy_dedup_keep

        docs = rd.from_items([{"doc_id": i} for i in range(6)])
        pairs = rd.from_items([{"a": 1, "b": 4}, {"a": 4, "b": 2}])
        for limit in (5_000_000, 0):  # broadcast path and join fallback
            out = (
                fuzzy_dedup_keep(docs, pairs, broadcast_limit=limit)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert list(out["component"]) == [0, 1, 1, 3, 1, 5]
            assert list(out["keep"]) == [True, True, False, True, False, True]

    def test_chunk_dedup_keep_first(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import chunk_dedup

        docs = rd.from_items(
            [
                {"doc_id": 10, "text": "alpha\nbeta\nalpha"},
                {"doc_id": 11, "text": "beta\ngamma"},
                {"doc_id": 12, "text": ""},
                {"doc_id": 13, "text": ""},
            ]
        )
        for limit in (5_000_000, 0):  # broadcast path and join fallback
            out = (
                chunk_dedup(docs, broadcast_limit=limit)
                .to_pandas()
                .sort_values(["doc_id", "chunk_idx"])
                .reset_index(drop=True)
            )
            # alpha@10:0 keeps; beta@10:1 keeps; alpha@10:2 dup; beta@11:0 dup;
            # gamma keeps; first empty-string chunk (12:0) keeps, 13:0 dup
            assert list(out["keep"]) == [True, True, False, False, True, True, False]

    def test_kmeans_empty_cluster_keeps_centroid(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.cluster import kmeans_assign

        # centroid 1 starts on an outlier but every point is closer to
        # centroid 0 after the first recompute; the empty cluster must
        # keep its previous centroid without crashing
        rows = [
            {"vec_id": 0, "embedding": [0.0, 0.0]},
            {"vec_id": 1, "embedding": [100.0, 100.0]},
            {"vec_id": 2, "embedding": [0.1, 0.0]},
            {"vec_id": 3, "embedding": [0.0, 0.1]},
            {"vec_id": 4, "embedding": [120.0, 100.0]},
        ]
        out = (
            kmeans_assign(rd.from_items(rows), k=2, iters=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert list(out["cluster"]) == [0, 1, 0, 0, 1]

    def test_kmeans_deterministic(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.cluster import kmeans_assign

        embs = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = kmeans_assign(embs, k=4, iters=2).to_pandas().sort_values("vec_id")
        b = kmeans_assign(embs, k=4, iters=2).to_pandas().sort_values("vec_id")
        assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()

    def test_semdedup_prunes_within_cluster(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.cluster import semdedup

        # two tight groups far apart; within each group all vectors are
        # near-identical -> each cluster keeps exactly its lowest id
        rows = []
        for i in range(4):
            rows.append({"vec_id": i, "embedding": [1.0, 0.0 + i * 1e-4]})
        for i in range(4, 8):
            rows.append({"vec_id": i, "embedding": [-1.0, 100.0 + i * 1e-4]})
        out = (
            semdedup(rd.from_items(rows), k=2, iters=2, threshold=0.9)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert list(out["keep"]) == [True, False, False, False, True, False, False, False]
        # exactly two clusters, split at the group boundary
        assert out["cluster"].nunique() == 2
        assert set(out.loc[out["vec_id"] < 4, "cluster"]) != set(
            out.loc[out["vec_id"] >= 4, "cluster"]
        )


class TestPiiRedact:
    def test_planted_pii_redacted(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import pii_redact

        rows = [
            {"doc_id": 0, "text": "mail bob.smith+x@corp.example.org now"},
            {"doc_id": 1, "text": "server at 192.168.0.1 and 10.0.0.2"},
            {"doc_id": 2, "text": "call 555-123-4567 or 555 1234 5678 today"},
            {"doc_id": 3, "text": "clean document, nothing to scrub"},
            {"doc_id": 4, "text": None},
        ]
        out = (
            pii_redact(rd.from_items(rows))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["n_email"]) == [1, 0, 0, 0, 0]
        assert list(out["n_ip"]) == [0, 2, 0, 0, 0]
        assert list(out["n_phone"]) == [0, 0, 2, 0, 0]
        assert out.loc[0, "clean_text"] == "mail <EMAIL> now"
        assert out.loc[1, "clean_text"] == "server at <IP> and <IP>"
        assert out.loc[2, "clean_text"] == "call <PHONE> or <PHONE> today"
        assert out.loc[3, "clean_text"] == "clean document, nothing to scrub"
        assert out.loc[4, "clean_text"] == ""


class TestVocabOverlap:
    def test_overlap_fractions(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import vocab_overlap

        target = rd.from_items([{"doc_id": 0, "text": "Alpha beta GAMMA"}])
        docs = rd.from_items(
            [
                {"doc_id": 1, "text": "alpha alpha beta delta"},  # 3/4 in vocab
                {"doc_id": 2, "text": "epsilon zeta"},  # 0/2
                {"doc_id": 3, "text": ""},  # empty -> 0.0
                {"doc_id": 4, "text": "gamma"},  # 1/1 (case-folded)
            ]
        )
        out = (
            vocab_overlap(docs, target)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["n_tokens"]) == [4, 2, 0, 1]
        assert list(out["n_in_vocab"]) == [3, 0, 0, 1]
        assert list(out["overlap"]) == [0.75, 0.0, 0.0, 1.0]


class TestRangeJoinRollup:
    @pytest.fixture(scope="class")
    def tiny_sf(self, ray_session, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("tinysf")
        t0 = pd.Timestamp("2024-01-01 00:00:00")
        events = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "user_id": [7, 7, 7, 7, 8, 8],
                "ts": [
                    t0,  # src
                    t0,  # same user, same ts: strict > excludes the pair
                    t0 + pd.Timedelta(seconds=3600),  # exactly at the bound: included
                    t0 + pd.Timedelta(seconds=3601),  # one past: excluded
                    t0,  # other user at identical times: never pairs with 7
                    t0 + pd.Timedelta(seconds=10),
                ],
            }
        )
        pq.write_table(pa.Table.from_pandas(events), str(d / "events.parquet"))
        lineitem = pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "N"],
                "l_linestatus": ["F", "O", "O"],
                "l_quantity": [1.0, 2.0, 4.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(lineitem), str(d / "lineitem.parquet"))
        return str(d)

    def test_range_join_window_semantics(self, tiny_sf):
        from gleaner_ray.relational import range_join_events

        out = range_join_events(tiny_sf, window_s=3600).to_pandas()
        pairs = set(zip(out["src_event"], out["dst_event"]))
        # user 7: 1->3 and 2->3 (bound inclusive), 3->4 (1s apart), never
        # 1->2 (equal ts), never 1->4 / 2->4 (past bound); user 8: 5->6;
        # no cross-user pairs
        assert pairs == {(1, 3), (2, 3), (3, 4), (5, 6)}
        assert (out["src_ts"] < out["dst_ts"]).all()

    def test_rollup_levels(self, tiny_sf):
        from gleaner_ray.relational import rollup_agg_lineitem

        out = rollup_agg_lineitem(tiny_sf).to_pandas()
        total = out[out["l_returnflag"].isna()]
        assert len(total) == 1 and int(total["sum_qty"].iloc[0]) == 7 and int(total["n"].iloc[0]) == 3
        a_lvl = out[(out["l_returnflag"] == "A") & (out["l_linestatus"].isna())]
        assert int(a_lvl["sum_qty"].iloc[0]) == 3 and int(a_lvl["n"].iloc[0]) == 2
        finest = out[out["l_linestatus"].notna()]
        assert len(finest) == 3

    def test_df_rarity_exact(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import df_rarity

        rows = [
            {"doc_id": 1, "text": "a b a"},  # df(a)=2, df(b)=2 -> sum 2+2+2=6
            {"doc_id": 2, "text": "a b c"},  # 2+2+1=5
            {"doc_id": 3, "text": ""},  # empty: zeros
        ]
        out = df_rarity(rd.from_items(rows)).to_pandas().set_index("doc_id")
        assert int(out.loc[1, "sum_df"]) == 6 and int(out.loc[1, "n_tokens"]) == 3
        assert int(out.loc[2, "sum_df"]) == 5
        assert out.loc[1, "mean_df"] == 2.0
        assert int(out.loc[3, "n_tokens"]) == 0 and out.loc[3, "mean_df"] == 0.0


class TestTfidfTopk:
    def test_rare_term_ranks_first(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import tfidf_topk

        ds = rd.from_items(
            [
                {"doc_id": 0, "text": "common common zebra"},
                {"doc_id": 1, "text": "common words here"},
                {"doc_id": 2, "text": "common words again"},
                {"doc_id": 3, "text": ""},
            ]
        )
        got = tfidf_topk(ds, k=2).to_pandas()
        d0 = got[got.doc_id == 0].sort_values("rank")
        # zebra: tf=1/df=1 (1.0) beats common: tf=2/df=3 (0.667)
        assert list(d0["tok"]) == ["zebra", "common"]
        assert d0["score"].iloc[0] == 1.0
        # empty doc emits no rows
        assert not (got.doc_id == 3).any()
        # tie on score -> token byte order (here 'again' and 'here' both
        # tf=1; df(again)=1 -> 1.0 vs df(here)=1 -> 1.0, tie -> 'again' first)
        d2 = got[got.doc_id == 2].sort_values("rank")
        assert list(d2["tok"])[0] == "again"


class TestSourceGate:
    def test_whole_source_drops(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import source_gate

        ds = rd.from_items(
            [
                # mill: mean 4 chars — its one long doc must drop too
                {"doc_id": 0, "source": "mill", "text": "ab"},
                {"doc_id": 1, "source": "mill", "text": "cd"},
                {"doc_id": 2, "source": "mill", "text": "x" * 20},
                # good: mean 30 chars — its one short doc survives
                {"doc_id": 3, "source": "good", "text": "y" * 55},
                {"doc_id": 4, "source": "good", "text": "z" * 5},
            ]
        )
        got = source_gate(ds, min_mean_chars=10).to_pandas()
        assert sorted(got["doc_id"]) == [3, 4]
        assert set(got["source"]) == {"good"}


class TestSourceTV:
    def test_hand_computed(self, ray_session):
        from fractions import Fraction

        import ray.data as rd

        from gleaner_ray.ops.sampling import source_tv_distance

        ds = rd.from_items(
            [
                {"doc_id": 0, "source": "s1", "text": "a a b"},
                {"doc_id": 1, "source": "s2", "text": "a b b b"},
            ]
        )
        got = source_tv_distance(ds).to_pandas().set_index("source")
        # s1: p=(2/3,1/3) vs corpus (3/7,4/7) -> TV = 5/21; s2 -> 5/28
        assert got.loc["s1", "tv"] == float(Fraction(5, 21))
        assert got.loc["s2", "tv"] == float(Fraction(5, 28))
        assert int(got.loc["s1", "n_tokens"]) == 3
        # absent-token fold: a source using a disjoint vocabulary is at
        # maximal distance 1 - its own mass share... verified exactly:
        ds2 = rd.from_items(
            [
                {"doc_id": 0, "source": "s1", "text": "x x"},
                {"doc_id": 1, "source": "s2", "text": "y y"},
            ]
        )
        got2 = source_tv_distance(ds2).to_pandas().set_index("source")
        # p_s1=(1,0), p=(1/2,1/2) -> TV = 1/2 for both
        assert got2.loc["s1", "tv"] == 0.5 and got2.loc["s2", "tv"] == 0.5
        # forced distributed path (driver_cap=0) agrees bit-for-bit
        got_dist = source_tv_distance(ds, driver_cap=0).to_pandas().set_index("source")
        assert got_dist.loc["s1", "tv"] == float(Fraction(5, 21))
        assert got_dist.loc["s2", "tv"] == float(Fraction(5, 28))


class TestSamplingWeights:
    def test_dup_weights_planted(self, docs_with_dups):
        from gleaner_ray.ops.dedup import dup_count_weights

        out = dup_count_weights(docs_with_dups).to_pandas().set_index("doc_id")
        # docs 1 and 3 are exact copies -> cluster size 2, weight 0.5 each
        assert int(out.loc[1, "dup_count"]) == 2 and out.loc[1, "weight"] == 0.5
        assert int(out.loc[3, "dup_count"]) == 2
        assert int(out.loc[4, "dup_count"]) == 1 and out.loc[4, "weight"] == 1.0
        # total training mass = number of distinct contents
        assert out["weight"].sum() == 4.0

    def test_uniform_n_stable_across_block_splits(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import uniform_sample_n

        rows = [{"doc_id": i} for i in range(200)]
        one = uniform_sample_n(rd.from_items(rows, override_num_blocks=1), n=10).to_pandas()
        many = uniform_sample_n(rd.from_items(rows, override_num_blocks=13), n=10).to_pandas()
        assert list(one["doc_id"]) == list(many["doc_id"])
        assert len(one) == 10 and one["h"].is_monotonic_increasing

    def test_length_quantile_filter_threshold(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import length_quantile_filter

        rows = [{"doc_id": i, "text": " ".join(["w"] * n)} for i, n in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
        out = length_quantile_filter(rd.from_items(rows), q=0.3).to_pandas()
        # ceil(0.3*10)=3rd smallest value = 3 tokens -> keep n_tokens >= 3
        assert sorted(out["n_tokens"]) == [3, 4, 5, 6, 7, 8, 9, 10]


class TestPivotLag:
    def test_pivot_counts(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import pivot_events

        events = pd.DataFrame(
            {
                "event_id": range(5),
                "user_id": [1, 1, 1, 2, 2],
                "ts": pd.to_datetime(["2024-01-01"] * 5),
                "event_type": ["click", "click", "view", "purchase", "click"],
            }
        )
        pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
        out = pivot_events(str(tmp_path)).to_pandas().set_index("user_id")
        assert int(out.loc[1, "n_click"]) == 2 and int(out.loc[1, "n_view"]) == 1
        assert int(out.loc[2, "n_purchase"]) == 1 and int(out.loc[2, "n_click"]) == 1
        assert int(out.loc[1, "n_error"]) == 0

    def test_lag_delta_boundaries(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import lag_delta_events

        t0 = pd.Timestamp("2024-01-01")
        events = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [1, 1, 2, 2],
                "ts": [t0, t0 + pd.Timedelta(microseconds=1500), t0, t0 + pd.Timedelta(seconds=2)],
            }
        )
        pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
        out = lag_delta_events(str(tmp_path)).to_pandas().set_index("event_id")
        # first event per user is the -1 sentinel (non-null int64 on
        # both engines — driver-hash parity), gaps exact microseconds
        assert int(out.loc[1, "gap_us"]) == -1 and int(out.loc[3, "gap_us"]) == -1
        assert str(out["gap_us"].dtype) == "int64"
        assert int(out.loc[2, "gap_us"]) == 1500
        assert int(out.loc[4, "gap_us"]) == 2_000_000


def test_cube_adds_status_margin(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gleaner_ray.relational import cube_agg_lineitem

    lineitem = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "N"],
            "l_linestatus": ["F", "O", "O"],
            "l_quantity": [1.0, 2.0, 4.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(lineitem), str(tmp_path / "lineitem.parquet"))
    out = cube_agg_lineitem(str(tmp_path)).to_pandas()
    # CUBE = ROLLUP's 3 levels + the per-status margin (flag NULL)
    margin = out[out["l_returnflag"].isna() & out["l_linestatus"].notna()].set_index("l_linestatus")
    assert int(margin.loc["O", "sum_qty"]) == 6 and int(margin.loc["O", "n"]) == 2
    assert int(margin.loc["F", "sum_qty"]) == 1
    assert len(out) == 3 + 2 + 2 + 1  # finest + per-flag + per-status + total


class TestRunningTotalStringAgg:
    def test_running_total_per_user(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import running_total_events

        t0 = pd.Timestamp("2024-01-01")
        events = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [1, 1, 1, 2],
                "ts": [t0, t0 + pd.Timedelta(seconds=1), t0 + pd.Timedelta(seconds=2), t0],
                "value": [1.25, 2.5, 0.999, 7.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
        out = running_total_events(str(tmp_path)).to_pandas().set_index("event_id")
        assert list(out.loc[[1, 2, 3], "rn"]) == [1, 2, 3]
        # floor(value*100) cents accumulate exactly: 125, 375, 474
        assert list(out.loc[[1, 2, 3], "cum_cents"]) == [125, 375, 474]
        assert int(out.loc[4, "rn"]) == 1 and int(out.loc[4, "cum_cents"]) == 700

    def test_string_agg_ordered(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import string_agg_orders

        d = pd.to_datetime
        orders = pd.DataFrame(
            {
                "o_orderkey": [10, 11, 12, 13],
                "o_custkey": [1, 1, 1, 2],
                "o_orderstatus": ["F", "O", "P", "F"],
                "o_orderdate": [d("2024-02-01"), d("2024-01-01"), d("2024-01-01"), d("2024-03-01")],
            }
        )
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        out = string_agg_orders(str(tmp_path)).to_pandas().set_index("o_custkey")
        # date asc, then orderkey asc: 11(O) then 12(P) then 10(F)
        assert out.loc[1, "statuses"] == "O,P,F" and int(out.loc[1, "n_orders"]) == 3
        assert out.loc[2, "statuses"] == "F"


class TestHistogramExplode:
    def test_token_histogram_bins(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import token_histogram

        rows = [
            {"doc_id": 0, "text": ""},  # 0 tokens -> bin 0
            {"doc_id": 1, "text": "a b c"},  # 3 -> bin 0
            {"doc_id": 2, "text": " ".join(["w"] * 105)},  # -> bin 100
            {"doc_id": 3, "text": " ".join(["w"] * 100)},  # -> bin 100
        ]
        out = token_histogram(rd.from_items(rows)).to_pandas().set_index("bin")
        assert int(out.loc[0, "n_docs"]) == 2
        assert int(out.loc[100, "n_docs"]) == 2

    def test_explode_tokens_positions(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import explode_tokens

        rows = [
            {"doc_id": 7, "text": "Hello  World"},
            {"doc_id": 8, "text": ""},
            {"doc_id": 9, "text": "x"},
        ]
        out = explode_tokens(rd.from_items(rows)).to_pandas()
        out = out.sort_values(["doc_id", "pos"], ignore_index=True)
        assert list(out["doc_id"]) == [7, 7, 9]
        assert list(out["pos"]) == [0, 1, 0]
        assert list(out["token"]) == ["hello", "world", "x"]


class TestOuterJoinsUnionMoving:
    def test_left_outer_survives_misses(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import left_outer_join_customers_orders

        cust = pd.DataFrame({"c_custkey": [1, 2], "c_name": ["a", "b"]})
        orders = pd.DataFrame(
            {
                "o_orderkey": [10, 11],
                "o_custkey": [1, 1],
                "o_totalprice": [5.0, 6.0],
                "o_orderpriority": ["1-URGENT", "3-MEDIUM"],
            }
        )
        pq.write_table(pa.Table.from_pandas(cust), str(tmp_path / "customer.parquet"))
        pq.write_table(pa.Table.from_pandas(orders), str(tmp_path / "orders.parquet"))
        out = left_outer_join_customers_orders(str(tmp_path)).to_pandas()
        # customer 1 joins only its URGENT order; customer 2 survives with NULLs
        assert len(out) == 2
        row2 = out[out["c_custkey"] == 2].iloc[0]
        assert pd.isna(row2["o_orderkey"]) and pd.isna(row2["o_totalprice"])
        assert int(out[out["c_custkey"] == 1].iloc[0]["o_orderkey"]) == 10

    def test_moving_sum_frame(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import moving_sum_events

        t0 = pd.Timestamp("2024-01-01")
        events = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "user_id": [1] * 5 + [2],
                "ts": [t0 + pd.Timedelta(seconds=i) for i in range(5)] + [t0],
                "value": [1.0, 2.0, 4.0, 8.0, 16.0, 99.0],
            }
        )
        pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
        out = moving_sum_events(str(tmp_path)).to_pandas().set_index("event_id")
        # frame = 3 preceding + current: 100, 300, 700, 1500, 3000 cents
        assert list(out.loc[[1, 2, 3, 4, 5], "moving_cents"]) == [100, 300, 700, 1500, 3000]
        assert int(out.loc[6, "moving_cents"]) == 9900  # user boundary resets

    def test_bernoulli_weighted_exact_coin(self, ray_session):
        import hashlib

        import ray.data as rd

        from gleaner_ray.ops.sampling import bernoulli_weighted

        rows = [
            {"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in [(0, 0), (1, 600), (2, 100), (3, 256)]
        ]
        out = bernoulli_weighted(rd.from_items(rows), scale=512).to_pandas()
        kept = set(out["doc_id"])
        assert 0 not in kept  # p=0 never kept
        assert 1 in kept  # p=1 always kept
        for i, n in [(2, 100), (3, 256)]:
            u = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
            assert (i in kept) == (u < n / 512)

    def test_bernoulli_weighted_rejects_non_pow2(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import bernoulli_weighted

        with pytest.raises(ValueError):
            bernoulli_weighted(rd.from_items([{"doc_id": 0, "text": "x"}]), scale=500)


def test_global_rank_ntile_semantics(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gleaner_ray.relational import global_rank_events

    t0 = pd.Timestamp("2024-01-01")
    # 6 events over 3 days; total=6, ntile(4): sizes 2,2,1,1 (SQL: first
    # total%n tiles take the extra row)
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": [t0 + pd.Timedelta(hours=h) for h in [0, 1, 30, 31, 60, 61]],
        }
    )
    pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
    out = global_rank_events(str(tmp_path)).to_pandas().sort_values("rank", ignore_index=True)
    assert list(out["event_id"]) == [1, 2, 3, 4, 5, 6]
    assert list(out["rank"]) == [1, 2, 3, 4, 5, 6]
    assert list(out["quartile"]) == [1, 1, 2, 2, 3, 4]


def test_corr_exact_moments(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gleaner_ray.relational import corr_value_hour_by_type

    t0 = pd.Timestamp("2024-01-01")
    # perfectly correlated group (value rises with hour) and a
    # perfectly anti-correlated one
    events = pd.DataFrame(
        {
            "event_type": ["up"] * 3 + ["down"] * 3,
            "ts": [t0 + pd.Timedelta(hours=h) for h in [1, 2, 3, 1, 2, 3]],
            "value": [1.0, 2.0, 3.0, 3.0, 2.0, 1.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
    out = corr_value_hour_by_type(str(tmp_path)).to_pandas().set_index("event_type")
    assert abs(out.loc["up", "corr_cents_hour"] - 1.0) < 1e-12
    assert abs(out.loc["down", "corr_cents_hour"] + 1.0) < 1e-12


class TestLexicalInverted:
    def test_lexical_diversity_exact(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import lexical_diversity

        rows = [
            {"doc_id": 0, "text": "a a a a"},  # ttr 1/4
            {"doc_id": 1, "text": "a b c d"},  # ttr 1
            {"doc_id": 2, "text": ""},  # ttr 0
        ]
        out = lexical_diversity(rd.from_items(rows)).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_tokens"] == 4 and out.loc[0, "n_distinct"] == 1
        assert out.loc[0, "ttr"] == 0.25
        assert out.loc[1, "ttr"] == 1.0
        assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "ttr"] == 0.0

    def test_inverted_index_rare_only(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import inverted_index

        # 'common' in 4 docs (> max_df=3, dropped); 'rare' in docs 2,0
        # (order-tested); 'once' in doc 3; dup within a doc collapses
        rows = [
            {"doc_id": 0, "text": "common rare rare"},
            {"doc_id": 1, "text": "common"},
            {"doc_id": 2, "text": "common rare"},
            {"doc_id": 3, "text": "common once"},
        ]
        out = inverted_index(rd.from_items(rows), max_df=3).to_pandas().set_index("token")
        assert "common" not in out.index
        assert out.loc["rare", "postings"] == "0,2" and int(out.loc["rare", "df"]) == 2
        assert out.loc["once", "postings"] == "3"


def test_json_extract_fallback_paths(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gleaner_ray.relational import json_extract_events

    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "props": [
                '{"k": 42}',  # fast path
                '{"k": -7}',  # fast path, negative
                '{"j": 1, "k": 9}',  # slow path: extra field
                '{"j": 1}',  # missing field -> NULL
                "not json",  # invalid -> NULL
                '{"k": "s"}',  # non-int value -> NULL
            ],
        }
    )
    pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
    out = json_extract_events(str(tmp_path)).to_pandas().set_index("event_id")
    assert int(out.loc[1, "k"]) == 42 and int(out.loc[2, "k"]) == -7
    assert int(out.loc[3, "k"]) == 9
    assert pd.isna(out.loc[4, "k"]) and pd.isna(out.loc[5, "k"]) and pd.isna(out.loc[6, "k"])


class TestWritePartitioned:
    def _events_ds(self):
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": range(100),
                    "event_type": ["click", "view", "purchase", "signup"] * 25,
                    "value": [float(i) for i in range(100)],
                }
            )
        )

    def test_fresh_write_marks_all(self, ray_session, tmp_path):
        import ray.data as rd

        from gleaner_ray.sinks import write_partitioned

        out = str(tmp_path / "out")
        res = write_partitioned(self._events_ds(), out, by="event_type")
        assert sorted(res["written"]) == ["click", "purchase", "signup", "view"]
        assert res["skipped"] == []
        assert rd.read_parquet(out).count() == 100

    def test_resume_skips_done_and_rewrites_incomplete(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from gleaner_ray.sinks import write_partitioned

        out = str(tmp_path / "out")
        write_partitioned(self._events_ds(), out, by="event_type")
        # simulate a crash: one partition lost its marker mid-write and
        # holds a partial (corrupt) duplicate file
        victim = os.path.join(out, "event_type=view")
        os.remove(os.path.join(victim, "_SUCCESS"))
        with open(os.path.join(victim, "extra.parquet"), "w") as f:
            f.write("partial garbage")
        res = write_partitioned(self._events_ds(), out, by="event_type")
        # only the unmarked partition is rewritten; the rest skip whole
        assert res["written"] == ["view"]
        assert sorted(res["skipped"]) == ["click", "purchase", "signup"]
        df = rd.read_parquet(out).to_pandas()
        assert len(df) == 100  # no duplicated rows, garbage file gone
        assert sorted(df[df.event_type == "view"]["event_id"])[:2] == [1, 5]


class TestWindowOpsRandomizedParity:
    """Seeded randomized parity: the distributed window operators vs
    independent in-memory pandas references (duplicate timestamps, user
    boundaries, negative values included by construction)."""

    def _random_events(self, seed, n=400, users=7):
        rng = np.random.default_rng(seed)
        t0 = pd.Timestamp("2024-01-01")
        # duplicate ts values on purpose: tie-break must come from event_id
        ts = t0 + pd.to_timedelta(rng.integers(0, n // 2, n), unit="s")
        return pd.DataFrame(
            {
                "event_id": rng.permutation(n).astype("int64"),
                "user_id": rng.integers(0, users, n).astype("int64"),
                "ts": ts,
                "value": rng.normal(0, 50, n),  # negatives included
            }
        )

    @pytest.mark.parametrize("seed", [1, 7, 23])
    def test_running_total_matches_reference(self, ray_session, tmp_path, seed):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import running_total_events

        df = self._random_events(seed)
        d = tmp_path / str(seed)
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))
        out = running_total_events(str(d)).to_pandas().sort_values("event_id", ignore_index=True)

        ref = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        cents = pd.Series(np.floor(ref["value"].to_numpy() * 100.0).astype("int64"))
        ref = ref.assign(
            rn=ref.groupby("user_id").cumcount() + 1,
            cum_cents=cents.groupby(ref["user_id"]).cumsum(),
        ).sort_values("event_id", ignore_index=True)
        assert list(out["rn"]) == list(ref["rn"])
        assert list(out["cum_cents"]) == list(ref["cum_cents"])

    @pytest.mark.parametrize("seed", [1, 23])
    def test_global_rank_matches_argsort(self, ray_session, tmp_path, seed):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import global_rank_events

        df = self._random_events(seed)
        d = tmp_path / str(seed)
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))
        out = global_rank_events(str(d)).to_pandas().sort_values("rank", ignore_index=True)

        ref = df.sort_values(["ts", "event_id"], ignore_index=True)
        assert list(out["event_id"]) == list(ref["event_id"])
        assert list(out["rank"]) == list(range(1, len(ref) + 1))
        # ntile sizes: first total%4 tiles carry the extra row
        sizes = out.groupby("quartile").size()
        n = len(ref)
        q, r = divmod(n, 4)
        assert list(sizes) == [q + 1] * r + [q] * (4 - r)


def test_time_range_sum_peers_and_window(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gleaner_ray.relational import time_range_sum_events

    t0 = pd.Timestamp("2024-01-01")
    # user 1: 00:00 (1.0), 00:30 (2.0), 01:20 (4.0), 01:20 (8.0 peer)
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "ts": [t0, t0 + pd.Timedelta(minutes=30), t0 + pd.Timedelta(minutes=80), t0 + pd.Timedelta(minutes=80)],
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(events), str(tmp_path / "events.parquet"))
    out = time_range_sum_events(str(tmp_path)).to_pandas().set_index("event_id")
    # 00:00 -> 100; 00:30 -> 300; 01:20 peers both see [00:20,01:20] = 2+4+8
    assert list(out.loc[[1, 2, 3, 4], "range_cents"]) == [100, 300, 1400, 1400]


class TestFrameOpsRandomizedParity:
    """Seeded randomized parity for the bounded/range window frames vs
    brute-force per-row references."""

    def _random_events(self, seed, n=300, users=5):
        rng = np.random.default_rng(seed)
        t0 = pd.Timestamp("2024-01-01")
        ts = t0 + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")  # 2h span, many in-window hits
        return pd.DataFrame(
            {
                "event_id": rng.permutation(n).astype("int64"),
                "user_id": rng.integers(0, users, n).astype("int64"),
                "ts": ts,
                "value": rng.normal(0, 50, n),
            }
        )

    @pytest.mark.parametrize("seed", [3, 17])
    def test_moving_sum_matches_bruteforce(self, ray_session, tmp_path, seed):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import moving_sum_events

        df = self._random_events(seed)
        d = tmp_path / str(seed)
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))
        out = moving_sum_events(str(d)).to_pandas().set_index("event_id")

        ref = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        cents = np.floor(ref["value"].to_numpy() * 100.0).astype("int64")
        for uid, g in ref.groupby("user_id"):
            idx = g.index.to_numpy()
            for pos, i in enumerate(idx):
                lo = max(0, pos - 3)
                expect = int(cents[idx[lo : pos + 1]].sum())
                assert int(out.loc[ref.loc[i, "event_id"], "moving_cents"]) == expect

    @pytest.mark.parametrize("seed", [3, 17])
    def test_time_range_sum_matches_bruteforce(self, ray_session, tmp_path, seed):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import time_range_sum_events

        df = self._random_events(seed)
        d = tmp_path / str(seed)
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df), str(d / "events.parquet"))
        out = time_range_sum_events(str(d), window_s=3600).to_pandas().set_index("event_id")

        cents = np.floor(df["value"].to_numpy() * 100.0).astype("int64")
        ts_us = df["ts"].to_numpy(dtype="datetime64[us]").view("int64")
        uid = df["user_id"].to_numpy()
        win = np.int64(3600) * 1_000_000
        for i in range(len(df)):
            mask = (uid == uid[i]) & (ts_us >= ts_us[i] - win) & (ts_us <= ts_us[i])
            expect = int(cents[mask].sum())  # peers at equal ts included
            assert int(out.loc[df.loc[i, "event_id"], "range_cents"]) == expect


class TestStreamWindow:
    def test_matches_pandas_reference(self, ray_session):
        import hashlib

        from gleaner_ray.relational import stream_window_events

        got = (
            stream_window_events("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values(["event_type", "window_start"], ignore_index=True)
        )
        df = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
        df["arr"] = df["ts"].astype("int64") + df["event_id"].map(
            lambda k: int(hashlib.md5(str(int(k)).encode()).hexdigest()[:8], 16)
            % 7_200_000_000
        )
        rows = []
        n_late = {}
        for t, g in df.groupby("event_type"):
            g = g.sort_values(["arr", "event_id"], ignore_index=True)
            wm = -np.inf
            late_n = 0
            for _, r in g.iterrows():
                ts = int(r["ts"].value) // 1000  # ns -> us
                if ts < wm - 600 * 1_000_000:
                    late_n += 1
                else:
                    rows.append((t, (ts // 300_000_000) * 300_000_000))
                wm = max(wm, ts)
            n_late[t] = late_n
        ref = (
            pd.DataFrame(rows, columns=["event_type", "w"])
            .groupby(["event_type", "w"], as_index=False)
            .size()
        )
        assert len(got) == len(ref)
        assert (np.sort(got["n"].to_numpy()) == np.sort(ref["size"].to_numpy())).all()
        # late events exist AND are accounted per type
        assert sum(n_late.values()) > 0
        for t, g in got.groupby("event_type"):
            assert int(g["n_late"].iloc[0]) == n_late[t]
            assert (g["n_late"] == g["n_late"].iloc[0]).all()


class TestOutliers:
    def test_planted_outlier(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gleaner_ray.relational import outliers_events

        # 40 values tight around 10.00, one at 500.00 -> only it trips 3σ
        vals = [10.0 + (i % 5) * 0.01 for i in range(40)] + [500.0]
        t = pa.table(
            {
                "event_id": pa.array(range(41), pa.int64()),
                "event_type": pa.array(["x"] * 41),
                "value": pa.array(vals, pa.float64()),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = outliers_events(str(tmp_path)).to_pandas()
        assert list(got["event_id"]) == [40]
        assert int(got["value_cents"].iloc[0]) == 50000


class TestQuantilesUnbounded:
    """Randomized parity for the sample-bracket distributed selection:
    exact order statistics on unbounded float data, many blocks, ties,
    and tiny strides (bracket slack exercised hard)."""

    @pytest.mark.parametrize("seed,stride", [(1, 4), (7, 16), (23, 3)])
    def test_matches_numpy_selection(self, ray_session, tmp_path, seed, stride):
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from gleaner_ray.relational import quantiles_unbounded

        rng = np.random.default_rng(seed)
        n = 997
        # heavy ties + outliers: selection must still be exact
        v = np.concatenate(
            [rng.normal(0, 1, n - 100), np.repeat(3.5, 50), rng.normal(100, 5, 50)]
        )
        rng.shuffle(v)
        d = tmp_path / "t.parquet"
        d.mkdir()
        # many small files -> many blocks -> large n_blocks*stride slack
        for i, chunk in enumerate(np.array_split(v, 13)):
            pq.write_table(
                pa.table({"o_totalprice": chunk}), str(d / ("p%02d.parquet" % i))
            )
        qs = (0.1, 0.5, 0.95)
        got = quantiles_unbounded(str(tmp_path), qs=qs, stride=stride, table="t")
        sv = np.sort(v)
        for q in qs:
            want = sv[max(1, math.ceil(q * len(v))) - 1]
            assert got["p%02d" % round(q * 100)].iloc[0] == want, q


class TestBM25:
    def test_scores_match_naive_and_skip_absent_terms(self, ray_session):
        import math

        import ray.data as rd

        from gleaner_ray.ops.text import bm25_scores

        texts = [
            "fast sort sort window",
            "hash join",
            "",  # empty doc: never a candidate, still counts in N/avgdl
            "window window window fast",
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        # "zzz" never occurs: must neither crash nor emit rows for q2
        out = (
            bm25_scores(rd.from_pandas(df), {"q1": ["fast", "sort"], "q2": ["zzz"]})
            .to_pandas()
            .sort_values(["query_id", "doc_id"], ignore_index=True)
        )
        assert set(out["query_id"]) == {"q1"}
        assert list(out["doc_id"]) == [0, 3]

        # naive reference
        toks = [t.split() for t in texts]
        n = len(texts)
        avgdl = sum(len(t) for t in toks) / n
        k1, b = 1.2, 0.75

        def idf(term):
            d = sum(term in t for t in toks)
            return math.log(1.0 + (n - d + 0.5) / (d + 0.5))

        for _, row in out.iterrows():
            t = toks[int(row["doc_id"])]
            want = 0.0
            for term in ("fast", "sort"):
                tf = t.count(term)
                if tf:
                    want += idf(term) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            assert abs(row["score"] - want) < 1e-12, (row, want)


class TestLmPerplexity:
    def test_matches_naive_and_handles_empty_and_oov(self, ray_session):
        import math

        import ray.data as rd

        from gleaner_ray.ops.text import lm_perplexity

        texts = ["a b b", "b c", "", "a a a a"]
        df = pd.DataFrame({"doc_id": range(4), "text": texts})
        out = (
            lm_perplexity(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # naive: counts over the same corpus
        from collections import Counter

        c = Counter(w for t in texts for w in t.split())
        n, v = sum(c.values()), len(c)
        for i, t in enumerate(texts):
            toks = t.split()
            if not toks:
                assert out["ppl"].iloc[i] == 0.0
                continue
            mlp = sum(math.log((c[w] + 1) / (n + v)) for w in toks) / len(toks)
            assert abs(out["ppl"].iloc[i] - math.exp(-mlp)) < 1e-12

    def test_oov_probe_on_foreign_input(self, ray_session):
        # scoring a DIFFERENT dataset against a model trained on it is
        # the normal closed case; the OOV fallback is exercised by
        # probing a vocab that lacks the token (defensive branch)
        import numpy as np

        import ray.data as rd

        from gleaner_ray.ops.text import lm_perplexity

        df = pd.DataFrame({"doc_id": [0], "text": ["zzz_unseen"]})
        out = lm_perplexity(rd.from_pandas(df)).to_pandas()
        assert np.isfinite(out["ppl"].iloc[0]) and out["ppl"].iloc[0] > 0


class TestSentenceSplit:
    def test_grammar_and_indices(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import sentence_split

        docs = rd.from_items(
            [
                {"doc_id": 1, "text": "One. Two! Three? trailing"},
                {"doc_id": 2, "text": "..."},  # bare terminator run: no sentences
                {"doc_id": 3, "text": ""},
                {"doc_id": 4, "text": None},
                {"doc_id": 5, "text": "a...b"},
            ]
        )
        df = sentence_split(docs).to_pandas().sort_values(["doc_id", "sent_idx"], ignore_index=True)
        d1 = df[df.doc_id == 1]["sentence"].tolist()
        assert d1 == ["One.", " Two!", " Three?", " trailing"]
        assert df[df.doc_id == 2].empty and df[df.doc_id == 3].empty and df[df.doc_id == 4].empty
        assert df[df.doc_id == 5]["sentence"].tolist() == ["a.", "b"]
        assert df[df.doc_id == 1]["sent_idx"].tolist() == [0, 1, 2, 3]


class TestSubstringDedup:
    def test_any_offset_detection(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import substring_dedup

        passage = "p q r s t u v w x y"  # exactly one 10-token window
        docs = rd.from_items(
            [
                {"doc_id": 1, "text": "a b c " + passage + " d e"},  # offset 3: aligned chunking misses it
                {"doc_id": 2, "text": passage},
                {"doc_id": 3, "text": "entirely fresh tokens one two three four five six seven"},
                {"doc_id": 4, "text": "too short"},  # < width: no windows, absent from output
            ]
        )
        df = (
            substring_dedup(docs, width=10)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
            .set_index("doc_id")
        )
        assert 4 not in df.index
        # doc 1 holds the global first occurrence (rank 1<<20|3 < 2<<20|0
        # is FALSE: doc 1 packs to 1048579, doc 2 to 2097152 -> doc 1 wins)
        assert df.loc[1, "n_dup_windows"] == 0
        assert df.loc[2, "n_dup_windows"] == 1 and df.loc[2, "n_windows"] == 1
        assert df.loc[2, "dup_frac"] == 1.0
        assert df.loc[3, "n_dup_windows"] == 0

    def test_width_validation(self, ray_session):
        import pytest as _pytest

        from gleaner_ray.ops.dedup import substring_dedup

        with _pytest.raises(ValueError):
            substring_dedup(None, width=0)


class TestEpochPlan:
    def test_budget_sums_exactly(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import epoch_plan

        docs = rd.from_items(
            [
                {"source": "a1", "text": "one two three"},
                {"source": "a1", "text": "four five"},
                {"source": "b2", "text": "x y z w"},
                {"source": "c3", "text": ""},
            ]
        )
        df = epoch_plan(docs, budget=101, weights={"a1": 3, "b2": 1, "c3": 1})
        assert int(df["target_tokens"].sum()) == 101
        got = dict(zip(df["source"], df["target_tokens"]))
        # base: a1 = 303//5 = 60, b2 = c3 = 101//5 = 20; leftover 1 goes
        # to the largest remainder (a1: 303%5=3 > 101%5=1)
        assert got == {"a1": 61, "b2": 20, "c3": 20}
        e = dict(zip(df["source"], df["epochs"]))
        assert e["a1"] == 61 / 5 and e["b2"] == 20 / 4
        assert e["c3"] == 20.0  # zero-token source: epochs vs max(n,1)


class TestRankByKey:
    @pytest.mark.slow
    def test_matches_rownumber_and_survives_prefix_skew(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import rank_by_key

        # heavy prefix skew: most keys share the 2-char prefix "aa"
        keys = ["aa%03d" % (i % 7) for i in range(40)] + ["zz", "ab", "aa"]
        rows = [{"k": k, "id": "r%02d" % i} for i, k in enumerate(keys)]
        ds = rd.from_items(rows)
        got = (
            rank_by_key(ds, key="k", tiebreak="id", prefix_len=2)
            .to_pandas()
            .sort_values("pos", ignore_index=True)
        )
        want = sorted(rows, key=lambda r: (r["k"], r["id"]))
        assert got["k"].tolist() == [r["k"] for r in want]
        assert got["id"].tolist() == [r["id"] for r in want]
        assert got["pos"].tolist() == list(range(1, len(rows) + 1))

    def test_no_tiebreak_unique_keys(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import rank_by_key

        ds = rd.from_items([{"k": "b"}, {"k": "a"}, {"k": "c"}])
        got = rank_by_key(ds, key="k").to_pandas().sort_values("pos", ignore_index=True)
        assert got["k"].tolist() == ["a", "b", "c"]
        assert got["pos"].tolist() == [1, 2, 3]


class TestContainment:
    @pytest.mark.slow
    def test_quote_inclusion_caught(self, ray_session):
        """A short doc fully embedded in a 6x larger page: Jaccard
        stays far below 0.8 while containment hits 1.0."""
        import ray.data as rd

        from gleaner_ray.ops.dedup import ngram_containment_dedup, ngram_jaccard_dedup

        quote = "the quick brown fox jumps over the lazy dog again and again"
        filler = " ".join("w%d x%d y%d" % (i, i * 7, i * 13) for i in range(30))
        rows = [
            {"doc_id": 1, "text": quote},
            {"doc_id": 2, "text": filler + " " + quote + " " + filler[::-1].lower()},
            {"doc_id": 3, "text": "entirely unrelated content about marmots and tea"},
        ]
        ds = rd.from_items(rows)
        jac = ngram_jaccard_dedup(ds, threshold=0.8).to_pandas()
        con = ngram_containment_dedup(ds, threshold=0.8).to_pandas()
        assert len(jac) == 0  # symmetric metric misses the inclusion
        assert len(con) == 1
        r = con.iloc[0]
        assert (r.a, r.b) == (1, 2)
        assert r.containment == 1.0

    def test_symmetric_dups_still_pair(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.dedup import ngram_containment_dedup

        t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        ds = rd.from_items([{"doc_id": 1, "text": t}, {"doc_id": 2, "text": t}])
        out = ngram_containment_dedup(ds, threshold=0.8).to_pandas()
        assert len(out) == 1 and out.iloc[0].containment == 1.0


class TestInterleave:
    @pytest.mark.slow
    def test_round_robin_property(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.sampling import interleave_order

        rows = [{"doc_id": i, "source": "s%d" % (i % 3)} for i in range(30)]
        out = interleave_order(rd.from_items(rows)).to_pandas().sort_values("rr_pos")
        # rr_pos is a strict total order and visits sources round-robin
        assert out["rr_pos"].is_unique
        assert list(out["source"].iloc[:3].sort_values()) == ["s0", "s1", "s2"]
        # consecutive docs of one source are exactly n_sources apart
        for s, g in out.groupby("source"):
            d = np.diff(np.sort(g["rr_pos"].to_numpy()))
            assert (d == 3).all()


class TestLangMix:
    def test_code_switched_doc_detected(self, ray_session):
        import ray.data as rd

        from gleaner_ray.ops.text import lang_mix_profile

        en = "the and for with that this have from they which " * 13   # 130 tokens
        de = "der die und nicht das ist ich sie mit sich " * 13
        rows = [
            {"doc_id": 1, "text": en},
            {"doc_id": 2, "text": en.split(" ", 1)[1].rsplit(" ", 1)[0] + " " + de},  # switch mid-doc
            {"doc_id": 3, "text": ""},  # empty: no row
        ]
        out = lang_mix_profile(rd.from_items(rows)).to_pandas().set_index("doc_id")
        assert 3 not in out.index
        assert out.loc[1, "n_langs"] == 1 and out.loc[1, "top_lang"] == "en"
        assert out.loc[2, "n_langs"] >= 2  # chunks disagree across the switch
        assert out.loc[2, "top_frac"] < 1.0


class TestMediaDedup:
    def test_exact_payload_dedup_planted(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.ops.multimodal import media_dedup_exact

        # ids 1..5: payloads A,B,A,C,B -> groups {1,3},{2,5},{4}
        t = pa.table(
            {
                "media_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "payload": pa.array([b"A", b"B", b"A", b"C", b"B"], pa.binary()),
            }
        )
        out = (
            media_dedup_exact(rd.from_arrow(t))
            .to_pandas()
            .sort_values("keeper", ignore_index=True)
        )
        assert out["keeper"].tolist() == [1, 2, 4]
        assert out["n_copies"].tolist() == [2, 2, 1]

    def test_byte_sensitivity(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.ops.multimodal import media_dedup_exact

        # one-bit difference -> distinct groups (no codec normalization)
        t = pa.table(
            {
                "media_id": pa.array([10, 11], pa.int64()),
                "payload": pa.array([b"\x00\x01", b"\x00\x02"], pa.binary()),
            }
        )
        assert media_dedup_exact(rd.from_arrow(t)).count() == 2

    def test_null_payload_merges_with_empty_bytes(self, ray_session):
        # coalesce(payload, '') semantics: NULL and b"" share one group
        # (matches the documented SQL equivalent / the oracle's coalesce)
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.ops.multimodal import media_dedup_exact

        t = pa.table(
            {
                "media_id": pa.array([3, 1, 2], pa.int64()),
                "payload": pa.array([b"", None, b"x"], pa.binary()),
            }
        )
        out = (
            media_dedup_exact(rd.from_arrow(t))
            .to_pandas()
            .sort_values("keeper", ignore_index=True)
        )
        assert out["keeper"].tolist() == [1, 2]
        assert out["n_copies"].tolist() == [2, 1]

    def test_null_id_rejected_with_clear_error(self, ray_session):
        import pyarrow as pa
        import ray
        import ray.data as rd

        from gleaner_ray.ops.multimodal import media_dedup_exact

        t = pa.table(
            {
                "media_id": pa.array([1, None], pa.int64()),
                "payload": pa.array([b"a", b"b"], pa.binary()),
            }
        )
        with pytest.raises((ValueError, ray.exceptions.RayTaskError), match="media_id"):
            media_dedup_exact(rd.from_arrow(t)).materialize()
