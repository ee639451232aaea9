"""PROV named-graph generation (one JSON-LD graph per summoned object).

Reproduces ``provOGraph`` (/root/reference/internal/summoner/acquire/
prov.go:19-155). ``PROV_TEMPLATE`` is the reference's ``provTemplate``
byte-for-byte (an *output format* artifact, asserted by the reference's
e2e object checks), with Go ``text/template`` actions rewritten as
``@TOKEN@`` placeholders filled by plain substitution.

Determinism: the reference stamps ``time.Now()`` (prov.go:117); here the
run date is an explicit argument so tests and resumed runs produce
identical prov objects (SURVEY \u00a77.4 "Prov DATE determinism").
"""

from __future__ import annotations

from dataclasses import dataclass

from .identifier import get_sha

__all__ = ["ProvData", "prov_graph", "prov_object_name", "PROV_TEMPLATE"]

# output-format artifact: byte copy of provTemplate (prov.go:31-79)
PROV_TEMPLATE = '{\n\t"@context": {\n\t  "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",\n\t  "prov": "http://www.w3.org/ns/prov#",\n\t  "rdfs": "http://www.w3.org/2000/01/rdf-schema#"\n\t},\n\t"@graph": [\n\t  {\n\t\t"@id": "@PID@",\n\t\t"@type": "prov:Organization",\n\t\t"rdf:name": "@PNAME@",\n\t\t"rdfs:seeAlso": "@DOMAIN@"\n\t  },\n\t  {\n\t\t"@id": "@RESID@",\n\t\t"@type": "prov:Entity",\n\t\t"prov:wasAttributedTo": {\n\t\t  "@id": "@PID@"\n\t\t},\n\t\t"prov:value": "@RESID@"\n\t  },\n\t  {\n\t\t"@id": "https://gleaner.io/id/collection/@SHA256@",\n\t\t"@type": "prov:Collection",\n\t\t"prov:hadMember": {\n\t\t  "@id": "@RESID@"\n\t\t}\n\t  },\n\t  {\n\t\t"@id": "@URN@",\n\t\t"@type": "prov:Entity",\n\t\t"prov:value": "@SHA256@.jsonld"\n\t  },\n\t  {\n\t\t"@id": "https://gleaner.io/id/run/@SHA256@",\n\t\t"@type": "prov:Activity",\n\t\t"prov:endedAtTime": {\n\t\t  "@value": "@DATE@",\n\t\t  "@type": "http://www.w3.org/2001/XMLSchema#dateTime"\n\t\t},\n\t\t"prov:generated": {\n\t\t  "@id": "@URN@"\n\t\t},\n\t\t"prov:used": {\n\t\t  "@id": "https://gleaner.io/id/collection/@SHA256@"\n\t\t}\n\t  }\n\t]\n  }'


@dataclass
class ProvData:
    """ProvData (prov.go:19-29)."""

    resid: str
    sha: str
    pid: str
    source: str
    date: str  # YYYY-MM-DD, explicit for determinism
    urn: str
    pname: str
    domain: str
    runid: str = ""


def prov_graph(bucket: str, source_name: str, sha: str, urlloc: str, sources, run_date: str) -> str:
    """provOGraph (prov.go:116-155): fill the template for one object.

    ``sources`` is the source list; unknown sources fall back to
    "unknown" fields exactly as prov.go:119-128.
    """
    pid = pname = domain = "unknown"
    for src in sources:
        if src.name == source_name:
            pid, pname, domain = src.pid, src.propername, src.domain
    urn = "urn:%s:%s:%s" % (bucket, source_name, sha)
    out = PROV_TEMPLATE
    for key, val in (
        ("@PID@", pid),
        ("@PNAME@", pname),
        ("@DOMAIN@", domain),
        ("@RESID@", urlloc),
        ("@SHA256@", sha),
        ("@URN@", urn),
        ("@DATE@", run_date),
    ):
        out = out.replace(key, val)
    return out


def prov_object_name(source_name: str, prov_text: str) -> str:
    """prov/<source>/<sha1(prov)>.jsonld (prov.go:89,98)."""
    return "prov/%s/%s.jsonld" % (source_name, get_sha(prov_text))
