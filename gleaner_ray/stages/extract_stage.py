"""Extractor + validator actor-pool stage (Phase B of the summon pipeline).

One ``map_batches`` callable class: the JSON-LD validator state (the
reference rebuilds it per call and calls that out as waste,
ldproc.go:24-25 / jsonutils.go:79) is built ONCE per actor in
``__init__`` (ST1). ``__call__`` takes a zero-copy Arrow batch of page
rows joined to frontier metadata and emits one row per accepted JSON-LD
candidate:

- static/headless arbitration + extension arbitration (M3/M9,
  acquire.go:240, sources.go:155-163) — in Parquet-page mode the
  headless branch extracts from the stored ``html`` with the same
  selector semantics the renderer's in-page JS uses
  (headless.go:258-305), so both branches share the scanner;
- ``script[type^='application/ld+json']`` extraction (M10) /
  whole-body (M11);
- validation + graph-array explosion (M12/M13) via
  fixups.add_to_json_list_if_valid.

HTML never leaves this stage: output carries only the (much smaller)
candidate text, so the streaming executor drops page blocks as soon as
each batch is processed.
"""

from __future__ import annotations

import pyarrow as pa

from ..extract import extract_candidates, file_extension_is_json
from ..fixups import add_to_json_list_if_valid
from ..jsonld_lite import Validator

__all__ = ["ExtractValidate"]


class ExtractValidate:
    def __init__(self, context_maps: dict | None = None):
        self.validator = Validator(context_maps)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .fused import _ColumnBytes

        urls = batch.column("url").to_pylist()
        n = len(urls)
        # zero-copy Arrow views of the payload columns (same discipline
        # as the fused stage: html bytes are scanned in place, text is
        # decoded only on the whole-body branch)
        html_bytes = _ColumnBytes(batch.column("html")) if "html" in batch.column_names else None
        text_bytes = _ColumnBytes(batch.column("text")) if "text" in batch.column_names else None
        sources = batch.column("source").to_pylist() if "source" in batch.column_names else [""] * n
        hosts = batch.column("host").to_pylist() if "host" in batch.column_names else [""] * n
        seqs = batch.column("seq").to_pylist() if "seq" in batch.column_names else list(range(n))

        out_url, out_source, out_host, out_seq, out_idx, out_jsonld = [], [], [], [], [], []
        validator = self.validator
        for i, (url, source, host, seq) in enumerate(zip(urls, sources, hosts, seqs)):
            html = html_bytes.view(i) if html_bytes is not None else None
            text = (
                text_bytes.text(i)
                if text_bytes is not None and file_extension_is_json(url)
                else None
            )
            candidates, _ = extract_candidates(url, html, text)
            jsonlds: list[str] = []
            for cand in candidates:
                jsonlds, _err = add_to_json_list_if_valid(jsonlds, cand, validator)
            emitted = 0
            for di, doc in enumerate(jsonlds):
                if doc == "":
                    continue  # acquire.go:268-271 skips empty docs
                out_url.append(url)
                out_source.append(source)
                out_host.append(host)
                out_seq.append(seq)
                out_idx.append(di)
                out_jsonld.append(doc)
                emitted += 1
            if emitted == 0:
                # marker row: URL was visited but yielded no JSON-LD —
                # the reference records the visit too (acquire.go:188-193);
                # downstream metrics count fetched = rows with doc_index<=0
                out_url.append(url)
                out_source.append(source)
                out_host.append(host)
                out_seq.append(seq)
                out_idx.append(-1)
                out_jsonld.append("")
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "source": pa.array(out_source, pa.string()),
                "host": pa.array(out_host, pa.string()),
                "seq": pa.array(out_seq, pa.int64()),
                "doc_index": pa.array(out_idx, pa.int32()),
                "jsonld": pa.array(out_jsonld, pa.large_string()),
            }
        )
