"""Driver-replica correctness harness: run every queries() entry and
compare against its oracle_sql() via DuckDB (row count + schema-ish +
values), the way the external driver does at sf=0.01.

Crawl queries run at sf0.01 (their oracle reads the sf0.01 corpus the
module materializes at import); the rest run at sf0.001 for speed.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype) == "category":
            df[c] = df[c].astype(str)
    key = df.astype(str).agg("|".join, axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def assert_frames_match(rdf: pd.DataFrame, odf: pd.DataFrame, name: str):
    assert len(rdf) == len(odf), "%s: row count %d != oracle %d" % (name, len(rdf), len(odf))
    assert sorted(rdf.columns) == sorted(odf.columns), "%s: columns %s != %s" % (
        name,
        sorted(rdf.columns),
        sorted(odf.columns),
    )
    # Driver-hash typing guard (VERDICT r4 item 1): the external driver
    # hashes values EXACTLY, so an integer engine column vs a float
    # oracle column (e.g. DuckDB HUGEINT -> fetchdf float64) red-flags
    # there even when every value matches. Catch it here first.
    for c in rdf.columns:
        if pd.api.types.is_integer_dtype(rdf[c]) and pd.api.types.is_float_dtype(odf[c]):
            raise AssertionError(
                "%s: engine column %r is integer (%s) but oracle returns float (%s) — "
                "wrap the oracle aggregate in CAST(... AS BIGINT) or the driver hash breaks"
                % (name, c, rdf[c].dtype, odf[c].dtype)
            )
    r, o = normalize(rdf), normalize(odf)
    for c in r.columns:
        rv, ov = r[c], o[c]
        if pd.api.types.is_float_dtype(rv) or pd.api.types.is_float_dtype(ov):
            rvf = rv.astype("float64").to_numpy()
            ovf = ov.astype("float64").to_numpy()
            both_nan = np.isnan(rvf) & np.isnan(ovf)
            close = np.isclose(rvf, ovf, rtol=1e-9, atol=1e-12)
            assert (both_nan | close).all(), "%s: float column %s differs" % (name, c)
        else:
            eq = (rv.astype(str) == ov.astype(str)).all()
            assert eq, "%s: column %s differs\n%s\n%s" % (name, c, rv.head(), ov.head())


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as mod

    return mod


SMALL_SF = "/root/testdata/sf0.001"
CRAWL_SF = "/root/testdata/sf0.01"


def _run_and_compare(contract, name: str, sf_dir: str):
    q = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    rdf = to_pandas(q(sf_dir))
    odf = oracle_df(sql, sf_dir)
    assert_frames_match(rdf, odf, name)


@pytest.mark.parametrize(
    "name",
    [
        "rel_filter_revenue",
        "rel_q1_agg",
        "rel_join_broadcast",
        "rel_join_hash",
        "rel_join_semi",
        "rel_join_anti",
        "rel_topk_orders",
        "rel_distinct_segments",
        "rel_window_events",
        "rel_sliding_window",
        "rel_distinct_users",
        "rel_asof_events_orders",
        "rel_quantiles",
        "rel_quantiles_price",
        "rel_outliers",
        "rel_dense_rank",
        "rel_percent_rank",
        "rel_rank",
        "rel_cume_dist",
        "rel_mad_outliers",
        "rel_quantiles_cont",
        "rel_multi_regr",
        "rel_stream_window",
        "crawl_url_canon",
        "rel_sessionize",
        "rel_grouped_topk",
        "rel_ntile",
        "rel_range_join",
        "rel_rollup",
        "rel_cube",
        "rel_pivot",
        "rel_lag_delta",
        "rel_running_total",
        "rel_string_agg",
        "rel_join_left_outer",
        "rel_join_full_outer",
        "rel_union_distinct",
        "rel_moving_sum",
        "rel_global_rank",
        "rel_corr",
        "rel_grouping_sets",
        "rel_intersect",
        "rel_except",
        "rel_json_extract",
        "rel_lead_delta",
        "rel_first_last",
        "rel_time_range_sum",
        "rel_join_skew",
        "rel_mode",
        pytest.param("rel_q3_shipping", marks=pytest.mark.slow),
        pytest.param("rel_above_avg", marks=pytest.mark.slow),
        "rel_regr",
        "samp_bernoulli_weighted",
        "text_token_stats",
        "text_histogram",
        "text_explode_tokens",
        "text_sentences",
        "text_lexical_diversity",
        "text_inverted_index",
        "text_quality",
        "text_fingerprint_md5",
        "text_langid",
        "text_langid_confusion",
        pytest.param("text_lang_mix", marks=pytest.mark.slow),
        "text_repetition",
        "text_gopher",
        pytest.param("text_phrases", marks=pytest.mark.slow),
        "text_bpe_train",
        "text_bpe_encode",
        "text_ngram_topk",
        "text_blocklist",
        "text_pii_redact",
        "text_decontaminate",
        "text_decontaminate_bloom",
        "text_decontaminate_fuzzy",
        "text_novelty",
        "dedup_cross_corpus",
        "samp_temperature",
        "rel_heavy_hitters",
        pytest.param("dedup_span_clean", marks=pytest.mark.slow),
        pytest.param("dedup_substring", marks=pytest.mark.slow),
        pytest.param("pipe_corpus_prep", marks=pytest.mark.slow),
        "samp_hash_split",
        "samp_stratified",
        "samp_pack_sequences",
        "samp_vocab_overlap",
        "samp_df_rarity",
        "samp_source_tv",
        pytest.param("text_tfidf_topk", marks=pytest.mark.slow),
        "text_bm25",
        "text_lm_perplexity",
        pytest.param("text_bigram_lm", marks=pytest.mark.slow),
        pytest.param("samp_dsir_weights", marks=pytest.mark.slow),
        "text_bpe_pairs",
        "samp_domain_cap",
        "samp_uniform_n",
        "samp_shuffle_pos",
        "samp_interleave",
        "samp_kfold",
        "samp_group_sample",
        "text_model_score",
        "text_ppl_buckets",
        "samp_source_mix",
        "samp_epoch_plan",
        "samp_dup_weights",
        "pipe_len_quantile_filter",
        "pipe_source_gate",
        pytest.param("pipe_training_data", marks=pytest.mark.slow),
        pytest.param("pipe_corpus_report", marks=pytest.mark.slow),
        "pipe_source_league",
        "dedup_exact",
        pytest.param("dedup_chunk", marks=pytest.mark.slow),
        pytest.param("dedup_fuzzy_keep", marks=pytest.mark.slow),
        pytest.param("dedup_keep_best", marks=pytest.mark.slow),
        "cluster_kmeans",
        pytest.param("dedup_semdedup", marks=pytest.mark.slow),
        pytest.param("dedup_ngram_jaccard", marks=pytest.mark.slow),
        pytest.param("dedup_containment", marks=pytest.mark.slow),
        pytest.param("dedup_embedding_cosine", marks=pytest.mark.slow),
        pytest.param("dedup_minhash_lsh", marks=pytest.mark.slow),
        pytest.param("dedup_simhash", marks=pytest.mark.slow),
        pytest.param("dedup_embedding_lsh", marks=pytest.mark.slow),
        "sim_knn_bruteforce",
        pytest.param("sim_ivf_knn", marks=pytest.mark.slow),
        "emb_covariance",
        "emb_pca_power",
        "emb_quantize_uint8",
        "emb_quant_error",
        pytest.param("sim_knn_quantized", marks=pytest.mark.slow),
        pytest.param("sim_knn_pq", marks=pytest.mark.slow),
        "text_char_entropy",
        "text_chunk_windows",
        "text_normalize",
        "media_decode_fake",
        "media_resize_fake",
        "media_frames_fake",
        "media_dedup_exact",
    ],
)
def test_oracle_checked_small(contract, name):
    _run_and_compare(contract, name, SMALL_SF)


@pytest.mark.parametrize(
    "name",
    [
        "crawl_extract_canon",
        "crawl_jsonext_wholebody",
        "crawl_fetch_counts",
        "crawl_dup_dedup",
        "crawl_results_full",
        "crawl_admission",
        "pipe_crawl_corpus",
        "crawl_change_detect",
        "crawl_priority_update",
        "crawl_host_stats",
        "crawl_mirror_hosts",
        "graph_outlink_degree",
        "graph_host_edges",
        "graph_indegree",
        "graph_pagerank",
        "graph_hits",
        "graph_host_rank",
        "graph_trustrank",
        "graph_spam_mass",
        "graph_triangles",
        "graph_rank_priority",
        "graph_discovered",
        "graph_components",
        "graph_component_sizes",
        "graph_indegree_topk",
        "crawl_depth_histogram",
        "graph_seed_depth",
        "graph_anchor_text",
        "graph_reciprocal",
        "graph_degree_dist",
        "graph_kcore",
        "graph_host_jaccard",
        "graph_host_scc",
        "graph_bowtie",
        "graph_host_clustering",
        "graph_avg_nbr_degree",
        "graph_outlink_locality",
        "graph_reciprocity_rate",
        "graph_lang_links",
        "graph_assortativity",
        "crawl_url_depth",
        "crawl_hreflang",
        "pipe_web_training",
        "graph_label_prop",
        "crawl_title_dups",
        "crawl_url_templates",
        "crawl_url_filter",
        "crawl_canonical",
        "crawl_type_profile",
        "crawl_boilerplate",
        "crawl_visible_text",
        "crawl_warc_roundtrip",
        "crawl_redirects",
        "crawl_soft404",
        "crawl_alias_collapse",
        "crawl_cdx_replay",
        "crawl_cdx_index",
        "crawl_cdx_publish",
        "crawl_fetch_dedup",
        "crawl_cross_dedup",
        "crawl_wet_roundtrip",
        "crawl_wat_roundtrip",
        "crawl_host_budget",
        "pipe_warc_extract",
    ],
)
@pytest.mark.slow
def test_oracle_checked_crawl(contract, name):
    # sf0.01 sweep: the bulk of full-suite wall time. `-m "not slow"`
    # skips it for the <5-min inner loop; CI runs the full suite.
    _run_and_compare(contract, name, CRAWL_SF)


def test_entry_smoke(contract):
    ds = contract.entry()
    assert ds.count() > 0


def test_every_oracle_key_has_query(contract):
    qs = contract.queries()
    for name in contract.oracle_sql():
        assert name in qs, name


def test_every_query_has_oracle(contract):
    # the whole board is oracle-checked — no rows-only queries left
    sqls = contract.oracle_sql()
    for name in contract.queries():
        assert name in sqls, name


def test_ntile_scale_path_matches_oracle(contract, ray_session):
    # force the beyond-cap regime: within-tie order via tie-sized
    # map_groups instead of the broadcast tie map
    from gleaner_ray import relational as rel

    sql = contract.oracle_sql()["rel_ntile"]
    rdf = to_pandas(rel.ntile_events(SMALL_SF, tie_cap=0))
    odf = oracle_df(sql, SMALL_SF)
    assert_frames_match(rdf, odf, "rel_ntile[tie_cap=0]")
