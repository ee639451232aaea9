"""The summon pipeline — Gleaner's crawl, restated Ray-Data-first.

Phases (SURVEY §3.4), one streaming Dataset graph end to end:

A. seed expansion -> frontier (driver-side Arrow table, or Parquet at
   10^10 scale);
B. frontier ⨝ pages on ``url`` + extract/validate actor pool;
C. normalize + SHA (stateless tasks);
D. first-writer dedup (sharded cuckoo actors — no shuffle) + sinks
   (results Parquet always; summoned/prov/org objects in parity mode).

Scale notes
-----------
- join strategy "broadcast": the frontier fits the object store
  (config-listed sitemap sources — even 10^8 urls × ~100B is 10 GB
  spread over nodes; below that it's a ray.put once, read per actor).
  "hash": both sides large -> ``Dataset.join`` hash-partitioned on url.
- no full materialization: pages stream through extract -> normalize ->
  dedup -> write_parquet with backpressure; html is dropped at the
  extract stage boundary.
- dedup is an actor probe, not a groupby: the only all-to-all in the
  whole pipeline is the optional hash join.
- results are written partitioned by source; the run manifest carries
  per-source metrics + input lineage; a re-run preloads the seen set
  from prior results and skips existing objects (the reference's
  idempotency semantics, jsonutils.go:383-388).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..cluster import cluster_cpus
from ..config import GleanerConfig
from ..org import org_nq, org_object_name
from ..prov import prov_graph, prov_object_name
from ..state.seen import create_seen_shards
from ..stages.dedup_stage import SeenFilter, dedup_exact
from ..stages.extract_stage import ExtractValidate
from ..stages.normalize_stage import make_normalizer
from ..sources.frontier import build_frontier

__all__ = ["summon", "AttachFrontier", "ObjectSink"]


class AttachFrontier:
    """Broadcast semi-join: keep page rows whose url is in the frontier and
    attach (source, seq, host, headless). The frontier dict travels via
    ray.put ONCE; each actor materializes it in __init__ (never per
    batch). Frontier rows without a page behave like HTTP errors
    (dropped, SURVEY §2.4); pages not in any sitemap are not crawled."""

    def __init__(self, frontier_ref):
        from ..stages.fused import _build_lookup

        self.lookup = _build_lookup(frontier_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.fused import FrontierIndex

        urls = batch.column("url").to_pylist()
        lookup = self.lookup
        if isinstance(lookup, FrontierIndex):
            # fully vectorized: membership + dictionary decode as array
            # ops; the page payload columns move via one Arrow take
            hit_mask, positions = lookup.lookup_batch(urls)
            keep_idx = np.nonzero(hit_mask)[0]
            pos = positions[keep_idx]
            names_s = np.asarray(lookup.source_names, dtype=object)
            names_h = np.asarray(lookup.host_names, dtype=object)
            sources = pa.array(names_s[lookup.source_codes[pos]], pa.string())
            hosts = pa.array(names_h[lookup.host_codes[pos]], pa.string())
            seqs = pa.array(lookup.seqs[pos], pa.int64())
            out = (
                batch.take(pa.array(keep_idx, pa.int32()))
                if len(keep_idx) < len(urls)
                else batch
            )
        else:
            keep_list, src_list, host_list, seq_list = [], [], [], []
            for i, url in enumerate(urls):
                hit = lookup.get(url)
                if hit is None:
                    continue
                keep_list.append(i)
                src_list.append(hit[0])
                host_list.append(hit[1])
                seq_list.append(hit[2])
            sources = pa.array(src_list, pa.string())
            hosts = pa.array(host_list, pa.string())
            seqs = pa.array(seq_list, pa.int64())
            out = (
                batch.take(pa.array(keep_list, pa.int32()))
                if len(keep_list) < len(urls)
                else batch
            )
        out = out.append_column("source", sources)
        out = out.append_column("host", hosts)
        out = out.append_column("seq", seqs)
        return out


class ObjectSink:
    """Parity-mode object store writer (map_batches pass-through).

    Per accepted doc row: the prov graph is written for EVERY row —
    before the dedup check, as the reference does (jsonutils.go:378-386)
    — and ``summoned/<source>/<sha>.jsonld`` only for first writers,
    never overwriting an existing object (StatObject-then-Put
    semantics, jsonutils.go:383-388). The store is an fsspec-backed
    ``ObjectStoreClient`` built ONCE per actor from the parsed minio
    config — file:// for parity runs, memory:// in tests, s3:// against
    live MinIO (objectstore.py)."""

    def __init__(
        self,
        root_url: str,
        bucket: str,
        source_info: dict,
        run_date: str,
        minio_cfg=None,
        write_usermeta: bool = False,
    ):
        from ..objectstore import ObjectStoreClient

        self.client = ObjectStoreClient(root_url, bucket, minio=minio_cfg)
        self.bucket = bucket
        self.source_info = source_info  # name -> Source-like namespace
        self.run_date = run_date
        self.write_usermeta = write_usermeta

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.fused import _ColumnBytes

        sources = batch.column("source").to_pylist()
        urls = batch.column("url").to_pylist()
        shas = batch.column("sha").to_pylist()
        names = batch.column("object_name").to_pylist()
        firsts = batch.column("seen_first").to_pylist()
        # jsonld payloads stay Arrow buffers end to end; only
        # first-writer rows are sliced out, as raw utf-8 bytes (a
        # duplicate-heavy crawl re-puts nothing)
        docs = _ColumnBytes(batch.column("jsonld"))
        srcs = list(self.source_info.values())
        for i, (source, url, sha, name, first) in enumerate(
            zip(sources, urls, shas, names, firsts)
        ):
            if not name:
                continue  # zero-candidate marker row
            prov = prov_graph(self.bucket, source, sha, url, srcs, self.run_date)
            self.client.put(prov_object_name(source, prov), prov, overwrite=True)
            if first:
                usermeta = (
                    {"url": url, "sha1": sha, "uniqueid": sha} if self.write_usermeta else None
                )
                self.client.put(name, docs.view(i), usermeta=usermeta, overwrite=False)
        return batch


def _write_group(ds: rd.Dataset, path: str) -> None:
    """Write one input group's results (own seam so tests can inject a
    mid-run crash between group commits)."""
    # min_rows_per_file coalesces blocks inside each write task: without it
    # every (block x source-partition) pair becomes its own tiny file
    # (~5k rows each at bench scale -> 480 files per run), and file-open
    # metadata dominates every later scan of the results
    ds.write_parquet(path, partition_cols=["source"], min_rows_per_file=200_000)


def _frontier_lookup(frontier: pa.Table) -> dict:
    urls = frontier.column("url").to_pylist()
    sources = frontier.column("source").to_pylist()
    hosts = frontier.column("host").to_pylist()
    orders = frontier.column("sitemap_order").to_pylist()
    return {u: (s, h, o) for u, s, h, o in zip(urls, sources, hosts, orders)}


def summon(
    cfg: GleanerConfig,
    pages_path: str,
    out_dir: str,
    run_date: str = "2026-01-01",
    fetch=None,
    frontier: pa.Table | None = None,
    write_objects: bool = True,
    dedup: str = "streaming",  # "streaming" (actor probe) | "exact" (sha shuffle)
    n_seen_shards: int = 8,
    concurrency=None,
    batch_size: int = 512,
    resume: bool = False,
    fused: bool = True,
    join: str = "broadcast",  # "broadcast" (index via plasma) | "hash" (Dataset.join)
    frontier_index_ref=None,
    pages_read_kwargs: dict | None = None,
    object_store_url: str | None = None,  # fsspec root; default file://<out_dir>/objects
    write_usermeta: bool = False,
    checkpoint_groups: int = 0,  # >0: split input files into N groups, checkpoint each
) -> dict:
    """Run the crawl; returns the run manifest (also written to disk).

    Checkpoint/resume (north rule: per-partition checkpoints): with
    ``checkpoint_groups=N`` the input Parquet files split into N
    contiguous groups; each group streams through the same graph and
    commits an ``out_dir/checkpoints.jsonl`` record after its output
    lands. A ``resume=True`` re-run skips committed groups entirely (no
    re-extraction) and unions their recorded output dirs into this run's
    metrics — on top of the seen-set preload, which keeps object-store
    idempotency across the groups that do re-run."""
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    # Per-stage pool sizing: the extract pool is the heavy stage (~60% of
    # CPUs); attach/dedup/sink are light half-CPU actors; the remainder
    # stays free for the elastic read/normalize/write tasks so no stage
    # starves another (see ray_guide "actor pools" pitfall).
    total_cpus = cluster_cpus(4)
    if concurrency is None:
        # proportional pool sizing so N vs 4N CPUs gives ~N vs 4N actors
        concurrency = max(1, (total_cpus * 5) // 8) if total_cpus >= 4 else 1
    io_concurrency = max(1, total_cpus // 8)

    timings: dict[str, float] = {}
    _t = time.time()

    def mark(name):
        nonlocal _t
        timings[name] = round(time.time() - _t, 3)
        _t = time.time()

    # -- Phase A: frontier --------------------------------------------------
    errors: list[str] = []
    if frontier is None:
        from ..sources.frontier import build_frontier_parallel, default_fetch

        frontier, errors = build_frontier_parallel(cfg, fetch or default_fetch)
    mark("frontier_build")
    # broadcast a numpy hash index of the frontier (built once on the
    # driver; numpy arrays deserialize as zero-copy plasma views in every
    # actor — no per-actor dict build). Callers that crawl repeatedly
    # (or at 10^10 scale, from a Parquet frontier) pass a prepared ref.
    lookup_ref = None
    if join == "broadcast":
        if frontier_index_ref is None:
            from ..stages.fused import FrontierIndex

            lookup_ref = ray.put(FrontierIndex.build(frontier))
        else:
            lookup_ref = frontier_index_ref
    mark("frontier_index")

    # results are versioned per run: resume unions prior runs' shas while
    # metrics only ever read the current run's table
    all_results = os.path.join(out_dir, "results")
    os.makedirs(all_results, exist_ok=True)
    prior_runs = sorted(d for d in os.listdir(all_results) if os.path.isdir(os.path.join(all_results, d)))
    run_id = "run-%04d" % len(prior_runs)
    results_dir = os.path.join(all_results, run_id)

    # -- seen set -----------------------------------------------------------
    shards = create_seen_shards(n_seen_shards)
    if resume and prior_runs:
        import pyarrow.compute as pc

        from ..state.seen import _shard_of

        prior = rd.read_parquet(
            [os.path.join(all_results, d) for d in prior_runs], columns=["sha", "seen_first"]
        ).map_batches(lambda t: t.filter(pc.field("seen_first")).select(["sha"]), batch_format="pyarrow")
        # stream the preload: one bounded batch at a time, routed straight
        # to the shard actors — never the whole prior sha set on the driver
        pending: list = []
        for batch in prior.iter_batches(batch_size=65536, batch_format="pyarrow"):
            by_shard: dict[int, list[str]] = {}
            for sha in batch.column("sha").to_pylist():
                if sha:
                    by_shard.setdefault(_shard_of(sha, n_seen_shards), []).append(sha)
            pending.extend(shards[k].preload.remote(v) for k, v in by_shard.items())
            if len(pending) > 4 * n_seen_shards:
                ray.get(pending)
                pending = []
        if pending:
            ray.get(pending)

    # -- Phases B-D: one streaming graph per input group ---------------------
    if object_store_url is None:
        object_store_url = "file://" + os.path.join(out_dir, "objects")
    read_kwargs = dict(pages_read_kwargs or {})
    # >=8 block-tasks per fused actor: at 2-3 tasks per actor the last
    # scheduling wave leaves actors idle for a whole task duration
    # (measured 56% -> ~80% pool packing on the 4x bench corpus)
    read_kwargs.setdefault("override_num_blocks", max(8, total_cpus * 2, int(concurrency) * 8))
    fix_options = {s.name: s.fixcontextoption.value for s in cfg.sources}

    def build_graph(pages: rd.Dataset) -> rd.Dataset:
        if join == "hash":
            # 10^10-scale path: both sides large -> hash-partitioned join on
            # url (an explicit all-to-all); the fused stage then runs with
            # frontier columns pre-attached (lookup_ref=None)
            frontier_ds = rd.from_arrow(frontier.select(["url", "source", "host", "sitemap_order"]))
            pages = pages.join(
                frontier_ds,
                join_type="inner",
                num_partitions=max(8, total_cpus),
                on=("url",),
            )
        if fused and dedup == "streaming":
            # hot path: ReadParquet -> Fused(actor pool) -> Write — one pool,
            # no inter-stage hops (stages/fused.py; semantics identical to the
            # decomposed graph below, pinned by the pipeline parity tests)
            from ..stages.fused import FusedSummon

            retrieval = {}
            for s in cfg.sources:
                try:
                    rc = cfg.retrieval_config(s.name)
                    retrieval[s.name] = (rc["delay_ms"], rc["threads"])
                except KeyError:
                    retrieval[s.name] = (0, 1)
            deduped = pages.map_batches(
                FusedSummon,
                fn_constructor_args=(
                    lookup_ref, shards, fix_options, cfg.context.strict, cfg.context.contextmaps, retrieval,
                ),
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
        else:
            joined = pages.map_batches(
                AttachFrontier, fn_constructor_args=(lookup_ref,), batch_format="pyarrow", batch_size=batch_size,
                concurrency=io_concurrency, num_cpus=0.5,
            )
            extracted = joined.map_batches(
                ExtractValidate,
                fn_constructor_args=(cfg.context.contextmaps,),
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
            normalized = extracted.map_batches(
                make_normalizer(fix_options, cfg.context.strict), batch_format="pyarrow", batch_size=batch_size
            )
            if dedup == "exact":
                deduped = dedup_exact(normalized)
            else:
                deduped = normalized.map_batches(
                    SeenFilter, fn_constructor_args=(shards,), batch_format="pyarrow", batch_size=batch_size,
                    concurrency=io_concurrency, num_cpus=0.5,
                )
        if write_objects:
            source_info = {s.name: s for s in cfg.sources}
            deduped = deduped.map_batches(
                ObjectSink,
                fn_constructor_args=(
                    object_store_url, cfg.minio.bucket_name(), source_info, run_date, cfg.minio, write_usermeta,
                ),
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=io_concurrency, num_cpus=0.5,
            )
        return deduped

    # input groups: the checkpoint unit is a contiguous slice of input
    # files (one directory of output per group — "resumable output: one
    # directory per input shard")
    groups: list[list[str] | None]
    if checkpoint_groups > 0 and os.path.isdir(pages_path):
        files = sorted(
            os.path.join(pages_path, f) for f in os.listdir(pages_path) if f.endswith(".parquet")
        )
        k = max(1, min(checkpoint_groups, len(files)))
        # balanced contiguous split into exactly k groups
        q, r = divmod(len(files), k)
        groups, at = [], 0
        for i in range(k):
            sz = q + (1 if i < r else 0)
            groups.append(files[at : at + sz])
            at += sz
    else:
        groups = [None]  # whole input, no per-group checkpointing

    ckpt_path = os.path.join(out_dir, "checkpoints.jsonl")
    done_groups: dict[str, dict] = {}
    if resume and os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            for line in f:
                rec = json.loads(line)
                done_groups[rec["group_key"]] = rec

    mark("setup")
    group_dirs: list[str] = []
    groups_skipped = 0
    try:
        for gi, gfiles in enumerate(groups):
            if gfiles is None:
                gdir = results_dir
                pages = rd.read_parquet(pages_path, columns=["url", "html", "text"], **read_kwargs)
                _write_group(build_graph(pages), gdir)
                group_dirs.append(gdir)
                continue
            import hashlib as _hashlib

            key = _hashlib.sha1(";".join(os.path.basename(p) for p in gfiles).encode()).hexdigest()[:16]
            prior_rec = done_groups.get(key)
            if prior_rec is not None and (
                prior_rec.get("dir") is None or os.path.isdir(prior_rec["dir"])
            ):
                if prior_rec.get("dir") is not None:
                    group_dirs.append(prior_rec["dir"])
                groups_skipped += 1
                continue
            gdir = os.path.join(results_dir, "group=%03d" % gi)
            gt0 = time.time()
            pages = rd.read_parquet(gfiles, columns=["url", "html", "text"], **read_kwargs)
            _write_group(build_graph(pages), gdir)
            if not os.path.isdir(gdir):
                # every row of the group was dropped (nothing admitted by
                # the frontier): write_parquet creates no directory for an
                # empty dataset. Commit the group as done with dir=None so
                # a resume skips it — at 10^10 URLs whole partitions
                # legitimately admit nothing (robots, seen-set, errors).
                gdir = None
            # the checkpoint record commits AFTER the group's output is fully
            # on disk — a crash mid-group leaves no record, so the group
            # re-runs whole (its object-store puts are idempotent)
            with open(ckpt_path, "a") as f:
                json.dump(
                    {
                        "group_key": key,
                        "group_index": gi,
                        "run_id": run_id,
                        "dir": gdir,
                        "files": [os.path.basename(p) for p in gfiles],
                        "elapsed_sec": round(time.time() - gt0, 3),
                    },
                    f,
                )
                f.write("\n")
            if gdir is not None:
                group_dirs.append(gdir)
    except BaseException:
        # a crashed run must not leak the seen-shard actors (their 0.1-CPU
        # reservations outlive the call otherwise); committed checkpoint
        # records stay, so a resume re-run skips the finished groups
        for s in shards:
            ray.kill(s)
        raise
    mark("pipeline_write")

    # -- org graphs (tiny, driver-side; root.go:159 runs them every time) ---
    org_errors: list[str] = []
    if write_objects:
        from ..objectstore import ObjectStoreClient

        client = ObjectStoreClient(object_store_url, cfg.minio.bucket_name(), minio=cfg.minio)
        for source in cfg.sources:
            try:
                nq = org_nq(source)
            except ValueError as e:
                org_errors.append(str(e))
                continue
            client.put(org_object_name(source.name), nq, overwrite=True)

    # -- metrics + manifest (north rule: per-partition metrics + lineage) ---
    # one pruned read of the just-written results (3 small columns) —
    # cheaper at scale than a per-batch metrics RPC on the hot path;
    # covers skipped groups' prior dirs so a resumed run reports the
    # logical union. Data-aware execution: below a disk-size threshold a
    # driver-side threaded pyarrow scan wins by ~20x (Ray's per-dataset
    # fixed cost exceeds the whole scan); above it, distribute with Ray.
    import pandas as pd

    def _counts(batch: pa.Table) -> pa.Table:
        # fetched: one row per visited page (doc_index <= 0 by
        # construction); sums are cross-batch safe. Arrow group_by keeps
        # the reduce in C (measured ~2.3x the pandas-lambda version).
        import pyarrow.compute as pc

        di = batch.column("doc_index")
        t = batch.append_column("fetched", pc.less_equal(di, 0)).append_column(
            "valid", pc.greater_equal(di, 0)
        )
        out = t.group_by("source").aggregate(
            [("fetched", "sum"), ("valid", "sum"), ("seen_first", "sum")]
        )
        return out.rename_columns(["source", "fetched", "valid", "uploaded"])

    def _dir_bytes(d: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total

    # 4 GiB of result files (jsonld column included, so this OVERestimates
    # the 3-column scan) ~ a sub-second threaded scan; at the 10^10-row
    # target the Ray branch runs instead
    _METRICS_LOCAL_BYTES = 4 << 30
    if all(d.startswith("/") or d.startswith("file://") for d in group_dirs) and sum(
        _dir_bytes(d.removeprefix("file://")) for d in group_dirs
    ) < _METRICS_LOCAL_BYTES:
        import pyarrow.dataset as _pds

        _parts = []
        for d in group_dirs:
            dst = _pds.dataset(d.removeprefix("file://"), format="parquet", partitioning="hive")
            tab = dst.to_table(columns=["source", "doc_index", "seen_first"])
            if tab.num_rows:
                _parts.append(_counts(tab).to_pandas())
        partials = pd.concat(_parts, ignore_index=True) if _parts else pd.DataFrame(
            columns=["source", "fetched", "valid", "uploaded"]
        )
        partials["source"] = partials["source"].astype(str)
    else:
        # one lazy read per group dir (read_parquet expands a directory
        # only when given a single path), unioned into one stream
        _reads = [
            rd.read_parquet(d, columns=["source", "doc_index", "seen_first"]) for d in group_dirs
        ]
        results = _reads[0].union(*_reads[1:]) if len(_reads) > 1 else _reads[0]
        partials = results.map_batches(_counts, batch_format="pyarrow").to_pandas()
    by_source = (
        partials.groupby("source", as_index=False).sum(numeric_only=True)
        if len(partials)
        else partials
    )
    mark("metrics")
    # input lineage (north rule: per-partition lineage in the manifest)
    try:
        lineage = sorted(os.listdir(pages_path)) if os.path.isdir(pages_path) else [os.path.basename(pages_path)]
    except OSError:
        lineage = []
    manifest = {
        "run_id": run_id,
        "results_dir": results_dir,
        "group_dirs": group_dirs,
        "checkpoint_groups": len(groups) if groups != [None] else 0,
        "groups_skipped": groups_skipped,
        "run_date": run_date,
        "input_files": lineage,
        "elapsed_sec": round(time.time() - t0, 3),
        "pages_path": os.path.abspath(pages_path),
        "frontier_size": frontier.num_rows,
        "frontier_errors": errors,
        "org_errors": org_errors,
        "dedup": dedup,
        "per_source": {
            str(r["source"]): {
                "fetched": int(r["fetched"]),
                "valid": int(r["valid"]),
                "uploaded": int(r["uploaded"]),
            }
            for _, r in by_source.iterrows()
        },
        "seen_stats": [ray.get(s.stats.remote()) for s in shards],
    }
    state_dir = os.path.join(out_dir, "state")
    ray.get([s.snapshot.remote(state_dir) for s in shards])
    for s in shards:  # release the 0.1-CPU reservations; state is on disk
        ray.kill(s)
    mark("snapshot")
    manifest["timings"] = timings
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# Broadcast cap for corpus_from_crawl's keep-first winner map: the
# duplicated-hash winner table is pulled to the driver and ray.put only
# while it stays under this many rows (~0.5 GB of (md5, url) pairs);
# beyond it the digest-bucket exchange below runs instead (VERDICT r4
# item 3 — at 10^10 URLs with heavy duplication the dict is
# corpus-cardinality).
_WINNER_CAP = 5_000_000


def corpus_from_crawl(results_ds, winner_cap: int | None = None, num_buckets: int = 256):
    """Crawl -> training-corpus handoff: turn the summon results table
    into a deduplicated document table ``(url, n_tokens, keep)`` —
    keep = this url is the lexicographically-first holder of its exact
    jsonld bytes (md5 identity, Min(url) arbitration).

    The integration step a web-scale pipeline runs between harvesting
    (this module) and corpus prep (``ops.text.corpus_prep``): exact
    object-level dedup ACROSS sources before any text scoring
    (reference identity analogue: SHA-based object naming dedupes
    storage in jsonutils.go — this dedupes the corpus).

    Scale shape — dual path, same contract as ``recrawl.change_detect``:
    narrow ``(md5, url)`` rows into ONE groupby(Min, Count); hashes
    seen more than once survive a distributed filter. While that
    winner table stays under ``winner_cap`` it broadcasts once
    (``ray.put``) and keep/token-count is fully map-side — zero
    exchanges of the results table. Beyond the cap the winner dict
    would be corpus-cardinality, so the fallback is the module's
    digest-BUCKET exchange (``web_training_prep``'s device): each batch
    emits one narrow (bucket, h, url, n_tokens) row per result row —
    token counts computed map-side so jsonld payloads never shuffle —
    and a ``num_buckets``-keyed map_groups finishes keep = (url ==
    in-bucket MIN(url) per h) exactly, since a digest lives wholly in
    one bucket. At 10^10 rows raise ``num_buckets`` so one bucket's
    rows fit a group task."""
    import hashlib

    import ray as _ray
    from ray.data.aggregate import Count, Min

    if winner_cap is None:
        winner_cap = _WINNER_CAP

    def md5(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    def to_h(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"h": [md5(j) for j in df["jsonld"].fillna("")], "url": df["url"]}
        )

    agg = (
        results_ds.map_batches(to_h, batch_format="pandas")
        .groupby("h")
        .aggregate(Min("url", alias_name="first_url"), Count(alias_name="n"))
    )
    dups = agg.map_batches(
        lambda df: df.loc[df["n"] > 1, ["h", "first_url"]], batch_format="pandas"
    ).materialize()

    if dups.count() <= winner_cap:
        wdf = dups.to_pandas()
        ref = _ray.put(dict(zip(wdf["h"], wdf["first_url"])) if len(wdf) else {})

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            winners = _ray.get(ref)
            j = df["jsonld"].fillna("")
            keep = [
                winners.get(md5(t)) in (None, u) for t, u in zip(j, df["url"])
            ]
            return pd.DataFrame(
                {
                    "url": df["url"],
                    "n_tokens": j.str.split().str.len().astype("int64"),
                    "keep": keep,
                }
            )

        return results_ds.map_batches(finish, batch_format="pandas")

    # beyond-cap path: narrow bucket exchange, no driver winner table
    def pack(df: pd.DataFrame) -> pd.DataFrame:
        j = df["jsonld"].fillna("")
        digs = [hashlib.md5(t.encode("utf-8")).digest() for t in j]
        return pd.DataFrame(
            {
                "bucket": np.fromiter((d[0] for d in digs), dtype=np.int64, count=len(digs))
                % num_buckets,
                "h": [d.hex() for d in digs],
                "url": df["url"].to_numpy(),
                "n_tokens": j.str.split().str.len().astype("int64").to_numpy(),
            }
        )

    def bucket_keep(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby("h")["url"].transform("min")
        return pd.DataFrame(
            {
                "url": df["url"],
                "n_tokens": df["n_tokens"].astype("int64"),
                "keep": (df["url"] == first).to_numpy(),
            }
        )

    return (
        results_ds.map_batches(pack, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_keep, batch_format="pandas")
    )


class _TypeProfile:
    """Actor-pool stage: full JSON-LD 1.1 expansion of each harvested
    document, emitting one partial-count row per (source, expanded
    top-level node @type). The Expander's processed-context cache is
    per-actor state (ST1) — a batch of thousands of schema.org documents
    pays context processing once. Untyped nodes count under 'untyped';
    documents the engine cannot expand (none exist in the harvested set,
    which already passed validation) would count under '!error'."""

    def __init__(self):
        from ..jsonld_expand import Expander

        self.expander = Expander()

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import json as _json
        from collections import Counter

        counts: Counter = Counter()
        for source, doc in zip(
            batch.column("source").to_pylist(), batch.column("jsonld").to_pylist()
        ):
            if not doc:
                # the graph-array quirk (fixups.add_to_json_list_if_valid)
                # appends an empty original slot — report it as such
                counts[(source, "empty")] += 1
                continue
            try:
                nodes = self.expander.expand(_json.loads(doc))
            except (ValueError, RecursionError):
                counts[(source, "!error")] += 1
                continue
            for node in nodes:
                types = node.get("@type") if isinstance(node, dict) else None
                if not types:
                    counts[(source, "untyped")] += 1
                    continue
                for t in types if isinstance(types, list) else [types]:
                    counts[(source, t)] += 1
        src, typ, n = [], [], []
        for (s, t), c in counts.items():
            src.append(s)
            typ.append(t)
            n.append(c)
        return pa.table(
            {"source": pa.array(src, pa.string()), "type_iri": pa.array(typ, pa.string()),
             "n_nodes": pa.array(n, pa.int64())}
        )


def type_profile(results_dir: str) -> "rd.Dataset":
    """Per-source expanded-@type inventory of a crawl's harvested
    documents — the corpus-shape report a harvester operator reads
    before handing the crawl to training-data prep.

    Scale shape: pruned read (3 columns), expansion fully map-side in an
    actor pool, partial (source, type) counts combined per batch, ONE
    tiny groupby-sum over at most |sources| x |types| rows. Document
    payloads never shuffle."""
    from ray.data.aggregate import Sum

    from ..cluster import cluster_cpus

    ds = rd.read_parquet(results_dir, columns=["source", "jsonld", "doc_index"])

    def _docs_only(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("doc_index"), 0))

    ds = ds.map_batches(_docs_only, batch_format="pyarrow")
    partials = ds.map_batches(
        _TypeProfile,
        batch_format="pyarrow",
        concurrency=(1, max(2, cluster_cpus() // 2)),
        batch_size=4096,
    )
    return partials.groupby(["source", "type_iri"]).aggregate(Sum("n_nodes", alias_name="n_nodes"))
