"""WARC / WET source + sink: the on-disk format of the Common-Crawl
data plane the pages table models (BASELINE input_hint).

The reference harvests sitemap-listed pages over HTTP; a 100-TB crawl
engine ingests and emits the ISO 28500 WARC interchange format instead
— response records for the raw fetch (html bytes) and WET-style
conversion records for the extracted text.  This module implements
both directions from the public spec (WARC/1.0, ISO 28500; WET layout
as published by Common Crawl), with NO external warc library:

- ``serialize_warc`` / ``serialize_wet`` — one batch -> one WARC file's
  bytes (optionally per-record gzip members, the Common-Crawl layout:
  a gzip stream per record so readers can seek record boundaries).
- ``parse_warc`` — bytes -> records, spec-correct framing: headers up
  to CRLFCRLF, then exactly ``Content-Length`` payload bytes, then the
  CRLFCRLF record separator (never a marker scan over the payload, so
  payloads containing ``WARC/1.0`` parse fine).
- ``write_warc_dataset`` — distributed sink: each input batch
  serializes to one ``.warc``/``.warc.gz`` part named by the batch's
  content hash (deterministic, resumable: a re-run overwrites the same
  part names, partial runs leave valid files).
- ``read_warc_dataset`` — distributed source: ``read_binary_files``
  over the part files -> ``flat`` parse per file -> the pages schema
  (url, warc_ts, html) or (url, warc_ts, text) for WET.

Determinism: WARC-Record-IDs are urn:uuid values derived from
md5(url), WARC-Date carries milliseconds (WARC/1.1 §5.4 subsecond
form), gzip members use mtime=0 — same input bytes -> same file bytes,
so the sink is hash-stable across runs and engines.

Scale shape: both directions are embarrassingly parallel map stages —
a record never crosses batch boundaries, no shuffle anywhere; file
sizing follows the input block size (CC convention ~1 GiB/file is a
``batch_size`` choice, not a code change).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "serialize_warc",
    "serialize_wet",
    "serialize_wat",
    "parse_warc",
    "write_warc_dataset",
    "read_warc_dataset",
    "surt",
    "build_cdx",
    "fetch_dedup_roles",
    "write_warc_deduped",
]

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _warc_date(ts_ms: int) -> str:
    """Epoch ms -> WARC-Date with millisecond precision (WARC/1.1 §5.4)."""
    import datetime as _dt

    t = _dt.datetime.fromtimestamp(ts_ms / 1000.0, tz=_dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%S.") + "%03dZ" % (ts_ms % 1000)


def _parse_warc_date(s: str) -> int:
    """WARC-Date (with or without subseconds) -> epoch ms."""
    import datetime as _dt

    s = s.strip()
    if "." in s:
        base, frac = s[:-1].split(".", 1)
        ms = int((frac + "000")[:3])
    else:
        base, ms = s[:-1], 0
    t = _dt.datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(tzinfo=_dt.timezone.utc)
    return int(t.timestamp()) * 1000 + ms


def _record_id(url: str) -> str:
    # deterministic urn:uuid from md5(url): version/variant nibbles set
    # so the id is a syntactically valid RFC 4122 UUID
    h = bytearray(hashlib.md5(url.encode()).digest())
    h[6] = (h[6] & 0x0F) | 0x30
    h[8] = (h[8] & 0x3F) | 0x80
    x = h.hex()
    return "urn:uuid:%s-%s-%s-%s-%s" % (x[:8], x[8:12], x[12:16], x[16:20], x[20:])


def _record(
    rec_type: str,
    url: str,
    ts_ms: int,
    content_type: str,
    payload: bytes,
    extra: dict[str, str] | None = None,
) -> bytes:
    # WARC grammar: optional whitespace around a header field value is
    # not part of the value, so a Target-URI with surrounding space/tab
    # is unrepresentable. Canonicalize at write time so that
    # serialize -> parse is idempotent (record id derives from the
    # stored form). Interior whitespace (never present in a real URI)
    # survives byte-exactly.
    url = url.strip(" \t")
    # extra named WARC headers (e.g. WARC-Refers-To-Target-URI for
    # revisit records) in sorted-key order for byte determinism
    extra_lines = "".join(
        "%s: %s\r\n" % (k, v) for k, v in sorted((extra or {}).items())
    )
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: %s\r\n"
        "WARC-Target-URI: %s\r\n"
        "WARC-Date: %s\r\n"
        "WARC-Record-ID: <%s>\r\n"
        "%s"
        "Content-Type: %s\r\n"
        "Content-Length: %d\r\n"
        % (rec_type, url, _warc_date(ts_ms), _record_id(url), extra_lines, content_type, len(payload))
    ).encode()
    return head + _CRLF + payload + _SEP


def _http_block(html: bytes) -> bytes:
    head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: %d" % len(html)).encode()
    return head + _SEP + html


def serialize_warc(urls, ts_ms, htmls, compress: bool = True) -> bytes:
    """One WARC file: a response record (HTTP block + html bytes) per
    page; ``compress=True`` emits one gzip member per record (the
    Common-Crawl seekable layout), mtime=0 for byte determinism."""
    out = io.BytesIO()
    for url, ts, html in zip(urls, ts_ms, htmls):
        rec = _record("response", url, int(ts), "application/http; msgtype=response", _http_block(bytes(html)))
        out.write(gzip.compress(rec, mtime=0) if compress else rec)
    return out.getvalue()


def serialize_wet(urls, ts_ms, texts, compress: bool = True) -> bytes:
    """One WET file: a conversion record (text/plain payload) per page."""
    out = io.BytesIO()
    for url, ts, text in zip(urls, ts_ms, texts):
        rec = _record("conversion", url, int(ts), "text/plain", (text or "").encode())
        out.write(gzip.compress(rec, mtime=0) if compress else rec)
    return out.getvalue()


# metadata extraction grammar shared with the SQL oracle (and with
# ops/linkgraph.HREF_RE / recrawl's title regex): anchors and <title>
_WAT_HREF_RE = re.compile(rb'<a href="([^"]+)"')
_WAT_TITLE_RE = re.compile(rb"<title>([^<]*)</title>")


def serialize_wat(urls, ts_ms, htmls, compress: bool = True) -> bytes:
    """One WAT file: a metadata record per page — the Common-Crawl
    metadata plane.  The JSON payload carries the link-graph /
    title signals a planner reads without touching the html plane:
    ``{"url", "title", "n_links", "links"}`` (compact separators,
    fixed key order, ascii-escaped — byte-deterministic)."""
    out = io.BytesIO()
    for url, ts, html in zip(urls, ts_ms, htmls):
        html = bytes(html)
        m = _WAT_TITLE_RE.search(html)
        title = m.group(1).decode("utf-8", "replace") if m else ""
        links = [x.decode("utf-8", "replace") for x in _WAT_HREF_RE.findall(html)]
        meta = json.dumps(
            {"url": url, "title": title, "n_links": len(links), "links": links},
            separators=(",", ":"),
        ).encode()
        rec = _record("metadata", url, int(ts), "application/json", meta)
        out.write(gzip.compress(rec, mtime=0) if compress else rec)
    return out.getvalue()


def _split_http(payload: bytes) -> bytes:
    """Strip the HTTP response header block from a response payload."""
    i = payload.find(_SEP)
    return payload[i + 4 :] if i >= 0 else payload


def parse_warc(blob: bytes) -> list[dict]:
    """Parse one WARC file's bytes (plain or multi-member gzip) into
    records: ``{url, warc_ts_ms, type, payload}``.  Framing follows the
    spec: headers to CRLFCRLF, exactly Content-Length payload bytes,
    then the record separator — payload bytes are never scanned."""
    if blob[:2] == b"\x1f\x8b":
        buf = io.BytesIO()
        with gzip.open(io.BytesIO(blob)) as g:  # reads across members
            buf.write(g.read())
        blob = buf.getvalue()
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos : pos + 5] != b"WARC/":
            break  # trailing garbage / padding: stop at first non-record
        hdr_end = blob.find(_SEP, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            # spec (ISO 28500 §4): optional-whitespace = SP/HTAB only —
            # a bare .strip() would eat \x0c etc. out of field values
            headers[k.strip(" \t").lower()] = v.strip(" \t")
        clen = int(headers.get("content-length", "0"))
        body = blob[hdr_end + 4 : hdr_end + 4 + clen]
        rec_type = headers.get("warc-type", "")
        payload = _split_http(body) if rec_type == "response" else body
        records.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "warc_ts_ms": _parse_warc_date(headers.get("warc-date", "1970-01-01T00:00:00Z")),
                "type": rec_type,
                "payload": payload,
                # revisit-record pointers (WARC/1.1 §6.7.2); empty on
                # every other record type
                "refers_url": headers.get("warc-refers-to-target-uri", ""),
                "payload_digest": headers.get("warc-payload-digest", ""),
            }
        )
        pos = hdr_end + 4 + clen + 4  # skip record separator
    return records


def write_warc_dataset(
    pages,
    out_dir: str,
    kind: str = "warc",
    compress: bool = True,
    ts_col: str = "warc_ts",
) -> list[dict]:
    """Distributed WARC/WET sink: one part file per input batch, named
    ``<kind>-<md5-of-first-url>-<n>.warc[.gz]`` — deterministic for a
    deterministic block layout, and self-describing enough that a
    resumed run simply overwrites its own parts.  Returns the manifest
    (path, n_records, n_bytes) rows."""
    os.makedirs(out_dir, exist_ok=True)
    payload_col = "text" if kind == "wet" else "html"  # wat derives from html
    serializer = {"warc": serialize_warc, "wet": serialize_wet, "wat": serialize_wat}[kind]

    def sink(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"path": pd.Series(dtype=str), "n_records": pd.Series(dtype="int64"), "n_bytes": pd.Series(dtype="int64")})
        urls = t.column("url").to_pylist()
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts_ms = pa.compute.cast(ts, pa.timestamp("ms")).cast(pa.int64()).to_pylist()
        else:
            ts_ms = ts.to_pylist()
        payload = t.column(payload_col).to_pylist()
        blob = serializer(urls, ts_ms, payload, compress=compress)
        name = "%s-%s-%d.%s" % (kind, hashlib.md5(urls[0].encode()).hexdigest()[:12], len(urls), "warc.gz" if compress else "warc")
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame({"path": [path], "n_records": [len(urls)], "n_bytes": [len(blob)]})

    out = pages.map_batches(sink, batch_format="pyarrow")
    return out.to_pandas().to_dict("records")  # manifest: one row per part


def read_warc_dataset(path: str, kind: str = "warc"):
    """Distributed WARC/WET/WAT source: binary-file read (one file per
    block) -> per-file parse -> pages-schema rows.  WARC yields
    (url, warc_ts, html); WET yields (url, warc_ts, text); WAT yields
    (url, warc_ts, title, n_links, links)."""
    import ray.data as rd

    want = {"warc": "response", "wet": "conversion", "wat": "metadata"}[kind]

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[int] = []
        payloads: list[bytes] = []
        for blob in t.column("bytes"):
            for rec in parse_warc(blob.as_py()):
                if rec["type"] != want:
                    continue
                urls.append(rec["url"])
                ts.append(rec["warc_ts_ms"])
                payloads.append(rec["payload"])
        cols: dict = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(ts, dtype=np.int64)).cast(pa.timestamp("ms")),
        }
        if kind == "warc":
            cols["html"] = pa.array(payloads, pa.binary())
        elif kind == "wet":
            cols["text"] = pa.array([p.decode() for p in payloads], pa.string())
        else:
            metas = [json.loads(p) for p in payloads]
            cols["title"] = pa.array([m["title"] for m in metas], pa.string())
            cols["n_links"] = pa.array([m["n_links"] for m in metas], pa.int64())
            cols["links"] = pa.array([m["links"] for m in metas], pa.list_(pa.string()))
        return pa.table(cols)

    return rd.read_binary_files(path).map_batches(parse, batch_format="pyarrow")


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform key (the Common-Crawl /
    IA CDX sort key): lowercase, scheme dropped, host labels reversed
    and comma-joined, default ports dropped, then ``)`` + path+query.
    ``https://H1.Example.org/Ref/x?b=1`` -> ``org,example,h1)/ref/x?b=1``."""
    u = url.strip().lower()
    i = u.find("://")
    rest = u[i + 3 :] if i >= 0 else u
    j = rest.find("/")
    host, tail = (rest, "/") if j < 0 else (rest[:j], rest[j:])
    if host.endswith(":80") or host.endswith(":443"):
        host = host.rsplit(":", 1)[0]
    frag = tail.find("#")
    if frag >= 0:
        tail = tail[:frag]
    return ",".join(reversed(host.split("."))) + ")" + tail


def _member_spans(blob: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each gzip member in a multi-member file —
    the seekable-WARC contract CDX offsets point into."""
    import zlib

    spans = []
    pos, n = 0, len(blob)
    mv = memoryview(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        d.decompress(mv[pos:])
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        spans.append((pos, consumed))
        pos += consumed
    return spans


def _uncompressed_spans(blob: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each record in a plain WARC file, from the
    spec framing (Content-Length, never a marker scan)."""
    spans = []
    pos, n = 0, len(blob)
    while pos < n and blob[pos : pos + 5] == b"WARC/":
        hdr_end = blob.find(_SEP, pos)
        if hdr_end < 0:
            break
        clen = 0
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            if k.strip(" \t").lower() == "content-length":
                clen = int(v.strip(" \t"))
        end = hdr_end + 4 + clen + 4
        spans.append((pos, end - pos))
        pos = end
    return spans


def build_cdx(warc_dir: str):
    """Distributed CDX(J) index build over a directory of WARC parts —
    the Common-Crawl lookup sidecar: one row per response record with
    ``(surt, ts14, url, digest, filename, offset, length)`` where
    ``offset/length`` delimit the record's own gzip member (the
    seekable layout: a reader fetches exactly [offset, offset+length)
    and gunzips one record).

    Scale shape: one task per part file (``read_binary_files``), spans
    from gzip member boundaries (or spec framing when uncompressed),
    zero shuffles — the index rows stream out as produced.  A published
    CDX is globally sorted by (surt, ts14); that final ordering is a
    rank problem, not a payload sort (``ops/sampling.shuffle_positions``
    seam), and is left to the publisher.  Digest is md5 of the response
    payload (the oracle-reproducible stand-in for CC's sha1-b32)."""
    import ray.data as rd
    from pyarrow import fs as pafs

    # The offsets must index the RAW part file (the bytes a range
    # request returns), but Ray's read_binary_files auto-gunzips ``.gz``
    # paths by extension with no opt-out (file_based_datasource.py
    # detects via pa.Codec when compression is None).  So list the parts
    # (bounded metadata listing) and read each file raw inside its own
    # task — same one-task-per-file shape, zero shuffles.
    fsys, root = pafs.FileSystem.from_uri(os.path.abspath(warc_dir))
    infos = fsys.get_file_info(pafs.FileSelector(root, recursive=True))
    paths = sorted(i.path for i in infos if i.type == pafs.FileType.File)
    ds = rd.from_items([{"path": p} for p in paths]).repartition(len(paths))

    def index(t: pa.Table) -> pd.DataFrame:
        import datetime as _dt

        rows: dict[str, list] = {
            "surt": [], "ts14": [], "url": [], "digest": [],
            "filename": [], "offset": [], "length": [],
        }
        for path_v in t.column("path"):
            path = path_v.as_py()
            with fsys.open_input_stream(path, compression=None) as f:
                blob = f.read()
            fname = os.path.basename(path)
            compressed = blob[:2] == b"\x1f\x8b"
            spans = _member_spans(blob) if compressed else _uncompressed_spans(blob)
            for off, ln in spans:
                chunk = blob[off : off + ln]
                recs = parse_warc(chunk)
                if not recs or recs[0]["type"] != "response":
                    continue
                r = recs[0]
                ts14 = _dt.datetime.fromtimestamp(
                    r["warc_ts_ms"] / 1000.0, tz=_dt.timezone.utc
                ).strftime("%Y%m%d%H%M%S")
                rows["surt"].append(surt(r["url"]))
                rows["ts14"].append(ts14)
                rows["url"].append(r["url"])
                rows["digest"].append(hashlib.md5(r["payload"]).hexdigest())
                rows["filename"].append(fname)
                rows["offset"].append(off)
                rows["length"].append(ln)
        out = pd.DataFrame(rows)
        out["offset"] = out["offset"].astype("int64")
        out["length"] = out["length"].astype("int64")
        return out

    return ds.map_batches(index, batch_format="pyarrow")


def fetch_dedup_roles(pages_ds):
    """Common-Crawl fetch-level dedup roles: per page, is it the FIRST
    fetch of its payload (a ``response`` record) or a repeat (a
    ``revisit`` record pointing at the original)?  CC writes revisit
    records instead of re-storing identical payloads (WARC/1.1 §6.7.2)
    — the storage-dedup twin of the miller's SHA identity (reference:
    the never-overwrite StatObject-then-Put semantics, jsonutils.go).

    First = smallest ``(warc_ts, url)`` within a digest group — a
    deterministic total order, so roles are stable across runs/engines.

    Output: ``(url, digest, rec_type, refers_url)``; ``refers_url`` is
    empty for responses.

    Scale shape: digests computed row-local; the ONLY exchange is keyed
    on digest and carries (url, ts, digest) — payload never moves.
    Digest groups are duplicate multiplicities (small); a viral payload
    duplicated across millions of URLs is one hot group — the keyed
    pair-dedupe salting of ``ops/dedup`` applies if observed."""

    def keys(t: pa.Table) -> pd.DataFrame:
        ts = t.column("warc_ts")
        if pa.types.is_timestamp(ts.type):
            ts_ms = pa.compute.cast(ts, pa.timestamp("ms")).cast(pa.int64()).to_pylist()
        else:
            ts_ms = ts.to_pylist()
        return pd.DataFrame(
            {
                "url": t.column("url").to_pylist(),
                "ts_ms": pd.Series(ts_ms, dtype="int64"),
                "digest": [hashlib.md5(bytes(h)).hexdigest() for h in t.column("html").to_pylist()],
            }
        )

    keyed = pages_ds.map_batches(keys, batch_format="pyarrow")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts_ms", "url"], kind="mergesort", ignore_index=True)
        first_url = df["url"].iloc[0]
        rec_type = np.where(np.arange(len(df)) == 0, "response", "revisit")
        refers = np.where(np.arange(len(df)) == 0, "", first_url)
        return pd.DataFrame(
            {"url": df["url"], "digest": df["digest"], "rec_type": rec_type, "refers_url": refers}
        )

    return keyed.groupby("digest").map_groups(assign, batch_format="pandas")


def write_warc_deduped(pages, out_dir: str, compress: bool = True, ts_col: str = "warc_ts"):
    """WARC sink with fetch-level dedup: the first fetch of each
    distinct payload writes a full response record; every repeat writes
    a revisit record carrying ``WARC-Refers-To-Target-URI`` and
    ``WARC-Payload-Digest`` and NO payload — the Common-Crawl storage
    layout for duplicated fetches.

    The winner table (digest -> (first_url, first_ts)) comes from
    ``fetch_dedup_roles``'s keyed exchange and is broadcast ONCE via
    ``ray.put``; the payload plane then streams through one sink pass,
    each row deciding response-vs-revisit by probing the broadcast map
    — payload bytes never shuffle.  Broadcast bound: O(distinct
    digests); beyond driver size, shard the winner table by digest
    prefix and probe the matching shard (the ``state/seen.py`` layout),
    or flip to a digest-keyed join of roles with payload."""
    import ray

    roles = fetch_dedup_roles(pages)
    winners_df = (
        roles.map_batches(
            lambda df: df[df["rec_type"] == "response"][["digest", "url"]],
            batch_format="pandas",
        )
        .to_pandas()
    )
    winner_map = dict(zip(winners_df["digest"], winners_df["url"]))
    ref = ray.put(winner_map)
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"path": pd.Series(dtype=str), "n_response": pd.Series(dtype="int64"), "n_revisit": pd.Series(dtype="int64")}
            )
        import ray as _ray

        wmap = _ray.get(ref)
        urls = t.column("url").to_pylist()
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts_ms = pa.compute.cast(ts, pa.timestamp("ms")).cast(pa.int64()).to_pylist()
        else:
            ts_ms = ts.to_pylist()
        htmls = t.column("html").to_pylist()
        out = io.BytesIO()
        n_resp = n_rev = 0
        for url, tms, html in zip(urls, ts_ms, htmls):
            html = bytes(html)
            digest = hashlib.md5(html).hexdigest()
            if wmap.get(digest) == url:
                rec = _record(
                    "response", url, int(tms), "application/http; msgtype=response", _http_block(html)
                )
                n_resp += 1
            else:
                rec = _record(
                    "revisit",
                    url,
                    int(tms),
                    "application/http; msgtype=response",
                    b"",
                    extra={
                        "WARC-Refers-To-Target-URI": wmap[digest],
                        "WARC-Payload-Digest": "md5:%s" % digest,
                        "WARC-Profile": "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                    },
                )
                n_rev += 1
            out.write(gzip.compress(rec, mtime=0) if compress else rec)
        blob = out.getvalue()
        name = "dedup-%s-%d.%s" % (
            hashlib.md5(urls[0].encode()).hexdigest()[:12],
            len(urls),
            "warc.gz" if compress else "warc",
        )
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame({"path": [path], "n_response": [n_resp], "n_revisit": [n_rev]})

    return pages.map_batches(sink, batch_format="pyarrow").to_pandas().to_dict("records")


def cdx_replay(warc_dir: str, sample_mod: int = 37):
    """Range-request replay through the CDX index — the end-to-end
    proof of the seek contract: for a deterministic md5 sample of
    indexed URLs, fetch EXACTLY ``[offset, offset+length)`` from the
    named part file, gunzip the single member, parse the one record it
    must contain, and emit the recovered payload identity.  This is the
    access path a wayback-style reader or a targeted re-extraction job
    uses against a petabyte WARC archive: no part file is ever scanned,
    only the sampled byte ranges move.

    Output: ``(url, replay_md5, n_bytes)`` for every sampled record;
    the oracle equates replay_md5 with md5 of the page's stored html —
    any framing or offset error breaks the hash.

    Scale shape: the index filter is row-local (one md5 per row); the
    replay stage groups its batch's rows by part file and issues one
    seek+read per record (grouped so a local file handle is reused;
    against object storage each becomes an HTTP range request).  Zero
    shuffles, parallelism = index blocks."""
    import ray.data as rd  # noqa: F401  (parallel read shape documented)

    idx = build_cdx(warc_dir)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        h = df["url"].map(lambda u: int(hashlib.md5(u.encode()).hexdigest()[:8], 16))
        return df[(h % sample_mod == 0).to_numpy()]

    sampled = idx.map_batches(pick, batch_format="pandas")

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        urls: list[str] = []
        md5s: list[str] = []
        nb: list[int] = []
        for fname, g in df.groupby("filename", sort=False):
            path = os.path.join(warc_dir, fname)
            with open(path, "rb") as f:
                for r in g.itertuples(index=False):
                    f.seek(int(r.offset))
                    blob = f.read(int(r.length))
                    if blob[:2] == b"\x1f\x8b":
                        blob = gzip.decompress(blob)
                    rec = parse_warc(blob)[0]
                    urls.append(r.url)
                    md5s.append(hashlib.md5(rec["payload"]).hexdigest())
                    nb.append(len(rec["payload"]))
        return pd.DataFrame(
            {
                "url": pd.Series(urls, dtype=str),
                "replay_md5": pd.Series(md5s, dtype=str),
                "n_bytes": pd.Series(nb, dtype="int64"),
            }
        )

    return sampled.map_batches(replay, batch_format="pandas")
