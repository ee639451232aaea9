"""Normalize + identify: stateless ``map_batches`` stage (Phase C).

Applies the ProcessJson fixup chain (M14-M18) and SHA-1 identity (M19)
per candidate row, then derives the object name
``summoned/<source>/<sha>.jsonld`` (jsonutils.go:357). Stateless — a
plain function, so Ray schedules it as elastic tasks rather than a
pinned actor pool.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..config import ContextOption
from ..fixups import process_json

__all__ = ["make_normalizer"]


def make_normalizer(fix_options: dict[str, str] | None = None, context_strict: bool = False):
    """Build the batch fn; ``fix_options`` maps source name ->
    FixContextOption string (per-source knob, sources.go:73)."""
    opts = {k: ContextOption.parse(v) for k, v in (fix_options or {}).items()}

    def normalize(batch: pa.Table) -> pa.Table:
        jsonlds = batch.column("jsonld").to_pylist()
        sources = batch.column("source").to_pylist()
        doc_indexes = batch.column("doc_index").to_pylist()
        fixed: list[str] = []
        shas: list[str] = []
        names: list[str] = []
        for source, doc, di in zip(sources, jsonlds, doc_indexes):
            if di < 0:  # zero-candidate marker row passes through
                fixed.append("")
                shas.append("")
                names.append("")
                continue
            out = process_json(doc, opts.get(source, ContextOption.HTTPS), context_strict)
            sha = hashlib.sha1(out.encode("utf-8")).hexdigest()
            fixed.append(out)
            shas.append(sha)
            names.append("summoned/%s/%s.jsonld" % (source, sha))
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["jsonld"] = pa.array(fixed, pa.large_string())
        cols["sha"] = pa.array(shas, pa.string())
        cols["object_name"] = pa.array(names, pa.string())
        return pa.table(cols)

    return normalize
