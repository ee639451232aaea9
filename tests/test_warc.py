"""WARC/WET source + sink: spec framing, byte determinism, gzip member
layout, and the distributed write -> read round trip."""

import glob
import gzip
import os

import pandas as pd
import pytest

from gleaner_ray.sources.warc import parse_warc, serialize_warc, serialize_wet

URLS = ["https://h1.org/a", "https://h2.org/b?x=1", "https://h3.org/c"]
TS = [1700000000123, 1700000001999, 1700000002000]
HTMLS = [b"<html>WARC/1.0\r\n\r\ntricky</html>", b"<html>two</html>", b""]


class TestFraming:
    def test_roundtrip_plain_and_gzip(self):
        for compress in (False, True):
            blob = serialize_warc(URLS, TS, HTMLS, compress=compress)
            recs = parse_warc(blob)
            assert [r["url"] for r in recs] == URLS
            assert [r["warc_ts_ms"] for r in recs] == TS
            # payloads containing record markers / CRLFCRLF survive:
            # framing is Content-Length, never a marker scan
            assert [r["payload"] for r in recs] == HTMLS

    def test_deterministic_bytes(self):
        a = serialize_warc(URLS, TS, HTMLS)
        b = serialize_warc(URLS, TS, HTMLS)
        assert a == b

    def test_gzip_member_per_record(self):
        blob = serialize_warc(URLS, TS, HTMLS, compress=True)
        # Common-Crawl layout: one gzip member per record -> N magic headers
        assert blob.count(b"\x1f\x8b\x08") >= len(URLS)
        # and each member decompresses to exactly one record
        first = gzip.decompress(blob[: blob.index(b"\x1f\x8b\x08", 1)])
        assert first.startswith(b"WARC/1.0\r\n") and first.count(b"WARC-Target-URI") == 1

    def test_wet_conversion_records(self):
        texts = ["text one", "unicode ü", ""]
        recs = parse_warc(serialize_wet(URLS, TS, texts))
        assert all(r["type"] == "conversion" for r in recs)
        assert [r["payload"].decode() for r in recs] == texts

    def test_date_subsecond_roundtrip(self):
        from gleaner_ray.sources.warc import _parse_warc_date, _warc_date

        for ms in (0, 1, 999, 1700000000123):
            assert _parse_warc_date(_warc_date(ms)) == ms
        assert _parse_warc_date("2023-11-14T22:13:20Z") == 1700000000000

    def test_record_id_valid_uuid(self):
        import uuid

        from gleaner_ray.sources.warc import _record_id

        rid = _record_id("https://h1.org/a")
        assert rid.startswith("urn:uuid:")
        u = uuid.UUID(rid[len("urn:uuid:") :])
        assert u.version == 3  # md5-derived


class TestDataset:
    def test_write_read_roundtrip(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.sources.warc import read_warc_dataset, write_warc_dataset

        t = pa.table(
            {
                "url": URLS,
                "warc_ts": pa.array(TS, pa.int64()).cast(pa.timestamp("ms")),
                "html": pa.array(HTMLS, pa.binary()),
                "text": ["one", "two", ""],
            }
        )
        out = str(tmp_path / "warc")
        manifest = write_warc_dataset(rd.from_arrow(t), out, kind="warc")
        assert sum(m["n_records"] for m in manifest) == 3
        assert all(os.path.exists(m["path"]) for m in manifest)
        back = read_warc_dataset(out, kind="warc").to_pandas().sort_values("url", ignore_index=True)
        assert list(back["url"]) == URLS
        assert [bytes(h) for h in back["html"]] == HTMLS
        got_ms = (back["warc_ts"].astype("int64") // {"ms": 1, "ns": 10**6}[back["warc_ts"].dt.unit]).tolist()
        assert got_ms == TS

        wet_out = str(tmp_path / "wet")
        write_warc_dataset(rd.from_arrow(t), wet_out, kind="wet")
        wback = read_warc_dataset(wet_out, kind="wet").to_pandas().sort_values("url", ignore_index=True)
        assert list(wback["text"]) == ["one", "two", ""]

    def test_sink_part_names_deterministic(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.sources.warc import write_warc_dataset

        t = pa.table(
            {
                "url": URLS,
                "warc_ts": pa.array(TS, pa.int64()).cast(pa.timestamp("ms")),
                "html": pa.array(HTMLS, pa.binary()),
            }
        )
        out = str(tmp_path / "w1")
        m1 = write_warc_dataset(rd.from_arrow(t), out, kind="warc")
        m2 = write_warc_dataset(rd.from_arrow(t), out, kind="warc")  # resume: overwrite same parts
        assert sorted(m["path"] for m in m1) == sorted(m["path"] for m in m2)
        assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == len(m1)


class TestWat:
    def test_wat_metadata_roundtrip(self):
        from gleaner_ray.sources.warc import serialize_wat

        htmls = [
            b'<html><title>Page A</title><a href="https://x.org/1">x</a><a href="https://y.org/2">y</a></html>',
            b"<html>no title no links</html>",
        ]
        recs = parse_warc(serialize_wat(URLS[:2], TS[:2], htmls))
        import json

        metas = [json.loads(r["payload"]) for r in recs]
        assert all(r["type"] == "metadata" for r in recs)
        assert metas[0]["title"] == "Page A"
        assert metas[0]["links"] == ["https://x.org/1", "https://y.org/2"]
        assert metas[0]["n_links"] == 2
        assert metas[1] == {"url": URLS[1], "title": "", "n_links": 0, "links": []}

    def test_wat_dataset_roundtrip(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from gleaner_ray.sources.warc import read_warc_dataset, write_warc_dataset

        t = pa.table(
            {
                "url": URLS[:2],
                "warc_ts": pa.array(TS[:2], pa.int64()).cast(pa.timestamp("ms")),
                "html": pa.array(
                    [b'<html><title>T</title><a href="https://z.org/">z</a></html>', b"<html></html>"],
                    pa.binary(),
                ),
            }
        )
        out = str(tmp_path / "wat")
        write_warc_dataset(rd.from_arrow(t), out, kind="wat")
        back = read_warc_dataset(out, kind="wat").to_pandas().sort_values("url", ignore_index=True)
        assert back["title"].tolist() == ["T", ""]
        assert back["n_links"].tolist() == [1, 0]
        assert list(back["links"][0]) == ["https://z.org/"]


class TestCdx:
    def test_surt_key(self):
        from gleaner_ray.sources.warc import surt

        assert surt("https://H1.Example.org/Ref/x?b=1") == "org,example,h1)/ref/x?b=1"
        assert surt("http://a.b.c:80/p") == "c,b,a)/p"
        assert surt("https://host.org") == "org,host)/"
        assert surt("https://host.org/p#frag") == "org,host)/p"

    def test_member_spans_seek_contract(self, tmp_path):
        # every CDX (offset, length) must delimit a self-contained gzip
        # member: fetch exactly that byte range, gunzip, get the record
        import hashlib

        from gleaner_ray.sources.warc import (
            _member_spans,
            _uncompressed_spans,
            parse_warc,
            serialize_warc,
        )

        blob = serialize_warc(URLS, TS, HTMLS, compress=True)
        spans = _member_spans(blob)
        assert len(spans) == len(URLS)
        assert spans[0][0] == 0
        assert sum(ln for _, ln in spans) == len(blob)
        for (off, ln), url, html in zip(spans, URLS, HTMLS):
            recs = parse_warc(blob[off : off + ln])
            assert len(recs) == 1 and recs[0]["url"] == url
            assert recs[0]["payload"] == html

        plain = serialize_warc(URLS, TS, HTMLS, compress=False)
        pspans = _uncompressed_spans(plain)
        assert len(pspans) == len(URLS)
        assert sum(ln for _, ln in pspans) == len(plain)
        for (off, ln), url in zip(pspans, URLS):
            assert parse_warc(plain[off : off + ln])[0]["url"] == url

    def test_build_cdx_dataset(self, ray_session, tmp_path):
        import hashlib

        from gleaner_ray.sources.warc import build_cdx, parse_warc, serialize_warc

        out = tmp_path / "warc"
        out.mkdir()
        (out / "part-0.warc.gz").write_bytes(serialize_warc(URLS, TS, HTMLS, compress=True))
        idx = build_cdx(str(out)).to_pandas().sort_values("url", ignore_index=True)
        assert len(idx) == len(URLS)
        assert set(idx["filename"]) == {"part-0.warc.gz"}
        for _, row in idx.iterrows():
            blob = (out / row["filename"]).read_bytes()
            rec = parse_warc(blob[row["offset"] : row["offset"] + row["length"]])[0]
            assert rec["url"] == row["url"]
            assert hashlib.md5(rec["payload"]).hexdigest() == row["digest"]
        # ts14 formats the record date in UTC
        assert idx.loc[idx["url"] == URLS[0], "ts14"].iloc[0] == "20231114221320"


class TestRevisit:
    # duplicate payloads across urls: a and c share bytes (a first by ts)
    DURLS = ["https://h1.org/a", "https://h2.org/b", "https://h1.org/c"]
    DTS = [1700000000000, 1700000001000, 1700000002000]
    DHTMLS = [b"<html>same</html>", b"<html>other</html>", b"<html>same</html>"]

    def test_roles(self, ray_session):
        import ray.data as rd

        from gleaner_ray.sources.warc import fetch_dedup_roles

        pages = rd.from_items(
            [
                {"url": u, "warc_ts": t, "html": h}
                for u, t, h in zip(self.DURLS, self.DTS, self.DHTMLS)
            ]
        )
        roles = fetch_dedup_roles(pages).to_pandas().set_index("url")
        assert roles.loc["https://h1.org/a", "rec_type"] == "response"
        assert roles.loc["https://h2.org/b", "rec_type"] == "response"
        assert roles.loc["https://h1.org/c", "rec_type"] == "revisit"
        assert roles.loc["https://h1.org/c", "refers_url"] == "https://h1.org/a"
        assert roles.loc["https://h1.org/a", "refers_url"] == ""

    def test_deduped_sink_roundtrip(self, ray_session, tmp_path):
        import hashlib

        import ray.data as rd

        from gleaner_ray.sources.warc import parse_warc, write_warc_deduped

        pages = rd.from_items(
            [
                {"url": u, "warc_ts": t, "html": h}
                for u, t, h in zip(self.DURLS, self.DTS, self.DHTMLS)
            ]
        )
        out = str(tmp_path / "dedup")
        manifest = write_warc_deduped(pages, out)
        assert sum(m["n_response"] for m in manifest) == 2
        assert sum(m["n_revisit"] for m in manifest) == 1
        recs = []
        for p in sorted(glob.glob(os.path.join(out, "*.warc.gz"))):
            recs.extend(parse_warc(open(p, "rb").read()))
        by_url = {r["url"]: r for r in recs}
        assert by_url["https://h1.org/a"]["type"] == "response"
        assert by_url["https://h1.org/a"]["payload"] == b"<html>same</html>"
        rev = by_url["https://h1.org/c"]
        assert rev["type"] == "revisit"
        assert rev["payload"] == b""
        assert rev["refers_url"] == "https://h1.org/a"
        assert rev["payload_digest"] == "md5:%s" % hashlib.md5(b"<html>same</html>").hexdigest()
        # revisit + referenced response reconstruct the original bytes
        assert by_url[rev["refers_url"]]["payload"] == b"<html>same</html>"
