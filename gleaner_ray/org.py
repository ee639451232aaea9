"""Organization graph generation — one n-quads object per source.

Reproduces ``BuildOrgJSONLD`` / ``BuildOrgNqsAndUpload``
(/root/reference/internal/organizations/org.go:20-118):
``ORG_TEMPLATE`` is the reference's ``orgJSONLDTemplate`` byte-for-byte
(output-format artifact); required fields PID / Name / URL are enforced
before templating (org.go:94-105); the JSON-LD is converted to n-quads
(jsonld_lite.to_nquads standing in for json-gold JLD2nq) and written to
``orgs/<name>.nq`` (org.go:79), overwriting on each run as the
reference does (root_internal_test.go:91-99 asserts same content,
newer LastModified).
"""

from __future__ import annotations

from .jsonld_lite import to_nquads

__all__ = ["ORG_TEMPLATE", "build_org_jsonld", "org_nq", "org_object_name"]

# output-format artifact: byte copy of orgJSONLDTemplate (org.go:20-35)
ORG_TEMPLATE = '{\n\t\t"@context": {\n\t\t\t"@vocab": "https://schema.org/"\n\t\t},\n\t\t"@id": "https://gleaner.io/id/org/@NAME@",\n\t\t"@type": "Organization",\n\t\t"url": "@URL@",\n\t\t"name": "@NAME@",\n\t\t "identifier": {\n\t\t\t"@type": "PropertyValue",\n\t\t\t"@id": "@PID@",\n\t\t\t"propertyID": "https://registry.identifiers.org/registry/doi",\n\t\t\t"url": "@PID@",\n\t\t\t"description": "Persistent identifier for this organization"\n\t\t}\n\t}'


def build_org_jsonld(source) -> str:
    """BuildOrgJSONLD (org.go:90-118); raises on empty required fields."""
    for field_name, val in (("PID", source.pid), ("Name", source.name), ("URL", source.url)):
        if val == "":
            raise ValueError("source %s is missing required field %s" % (source.name, field_name))
    return (
        ORG_TEMPLATE.replace("@NAME@", source.name)
        .replace("@URL@", source.url)
        .replace("@PID@", source.pid)
    )


def org_nq(source) -> str:
    """JSON-LD -> n-quads for one source (org.go:67-77)."""
    return to_nquads(build_org_jsonld(source))


def org_object_name(source_name: str) -> str:
    return "orgs/%s.nq" % source_name
