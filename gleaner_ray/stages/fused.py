"""Fused summon stage: attach -> extract/validate -> normalize -> seen-probe
in ONE actor-pool ``map_batches``.

The decomposed graph (AttachFrontier | ExtractValidate | normalize |
SeenFilter) is clearer and each piece is unit-tested, but every stage
boundary costs an object-store hop and its own pool reservation; on a
32-CPU node the fused stage turns the pipeline into
``ReadParquet -> Fused(actor pool) -> Write``, which keeps every core on
useful work. Semantics are identical by construction — the fused class
calls the same functions in the same order (equivalence covered by the
pipeline parity tests, which run the decomposed path).

The seen-probe stays an actor RPC out of this stage (the shards are the
shared crawl state); one bulk call per touched shard per batch.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray

from ..config import ContextOption
from ..extract import extract_candidates
from ..fixups import add_to_json_list_if_valid, process_json
from ..jsonld_lite import Validator
from ..state.seen import check_and_add_batched

__all__ = ["FusedSummon"]


class FusedSummon:
    def __init__(
        self,
        frontier_ref,
        shards: list,
        fix_options: dict[str, str] | None = None,
        context_strict: bool = False,
        context_maps: dict | None = None,
    ):
        self.lookup = ray.get(frontier_ref) if isinstance(frontier_ref, ray.ObjectRef) else frontier_ref
        self.shards = shards
        self.validator = Validator(context_maps)
        self.opts = {k: ContextOption.parse(v) for k, v in (fix_options or {}).items()}
        self.context_strict = context_strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist() if "text" in batch.column_names else [None] * len(urls)
        lookup = self.lookup
        validator = self.validator
        opts = self.opts
        strict = self.context_strict

        out_url, out_source, out_host, out_seq, out_idx = [], [], [], [], []
        out_jsonld, out_sha, out_name = [], [], []
        for url, html, text in zip(urls, htmls, texts):
            hit = lookup.get(url)
            if hit is None:
                continue
            source, host, seq = hit
            candidates, _ = extract_candidates(url, html, text)
            jsonlds: list[str] = []
            for cand in candidates:
                jsonlds, _err = add_to_json_list_if_valid(jsonlds, cand, validator)
            emitted = 0
            for di, doc in enumerate(jsonlds):
                if doc == "":
                    continue
                fixed = process_json(doc, opts.get(source, ContextOption.HTTPS), strict)
                sha = hashlib.sha1(fixed.encode("utf-8")).hexdigest()
                out_url.append(url)
                out_source.append(source)
                out_host.append(host)
                out_seq.append(seq)
                out_idx.append(di)
                out_jsonld.append(fixed)
                out_sha.append(sha)
                out_name.append("summoned/%s/%s.jsonld" % (source, sha))
                emitted += 1
            if emitted == 0:
                out_url.append(url)
                out_source.append(source)
                out_host.append(host)
                out_seq.append(seq)
                out_idx.append(-1)
                out_jsonld.append("")
                out_sha.append("")
                out_name.append("")
        real_pos = [i for i, s in enumerate(out_sha) if s]
        flags = [False] * len(out_sha)
        if real_pos:
            probe = check_and_add_batched(self.shards, [out_sha[i] for i in real_pos])
            for i, flag in zip(real_pos, probe):
                flags[i] = flag
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "source": pa.array(out_source, pa.string()),
                "host": pa.array(out_host, pa.string()),
                "seq": pa.array(out_seq, pa.int64()),
                "doc_index": pa.array(out_idx, pa.int32()),
                "jsonld": pa.array(out_jsonld, pa.large_string()),
                "sha": pa.array(out_sha, pa.string()),
                "object_name": pa.array(out_name, pa.string()),
                "seen_first": pa.array(flags, pa.bool_()),
            }
        )
