"""URDNA2015 (RDF Dataset Canonicalization) over parsed quads.

The reference normalizes JSON-LD through json-gold's
``Normalize(algorithm="URDNA2015", format="application/n-quads")``
(/root/reference/internal/common/ldproc.go; goldens in
internal/common/ldproc_test.go:40-105). This is a from-scratch
implementation of the published W3C RDF Dataset Canonicalization
algorithm (the RDC-1.0 / "URDNA2015" spec): first-degree hashes label
uniquely-hashed blank nodes; remaining nodes go through the N-degree
gossip-path hash with permutation search.

Quads are tuples ``(s, p, o, g)``:
- ``s``: blank node token (``_:x``) or absolute IRI string;
- ``p``: IRI string (no angle brackets);
- ``o``: a fully serialized object token — ``_:x``, ``<iri>``, or an
  N-Quads literal (``"..."``, ``"..."^^<dt>``, ``"..."@lang``);
- ``g``: graph IRI string or None for the default graph.

Exhaustive permutation search is exponential for pathological
highly-symmetric graphs (as in every implementation of this spec);
``max_permutations`` guards the crawl pipeline against poison inputs.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

__all__ = ["canonicalize", "serialize_quads"]


def _is_bnode(term: str) -> bool:
    return isinstance(term, str) and term.startswith("_:")


def _term_token(term: str) -> str:
    """Serialize a subject/graph position term (IRI or bnode)."""
    return term if _is_bnode(term) else "<%s>" % term


def _quad_nquad(quad, rename) -> str:
    s, p, o, g = quad
    s_t = rename(s) if _is_bnode(s) else "<%s>" % s
    o_t = rename(o) if _is_bnode(o) else o
    parts = [s_t, "<%s>" % p, o_t]
    if g is not None:
        parts.append(rename(g) if _is_bnode(g) else "<%s>" % g)
    return " ".join(parts) + " ."


class _Issuer:
    """Identifier issuer: stable prefix + first-issued order."""

    def __init__(self, prefix: str = "_:c14n"):
        self.prefix = prefix
        self.issued: dict[str, str] = {}
        self.order: list[str] = []

    def issue(self, old: str) -> str:
        if old not in self.issued:
            self.issued[old] = "%s%d" % (self.prefix, len(self.issued))
            self.order.append(old)
        return self.issued[old]

    def has(self, old: str) -> bool:
        return old in self.issued

    def clone(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.issued = dict(self.issued)
        c.order = list(self.order)
        return c


def canonicalize(quads, max_permutations: int = 5040) -> dict[str, str]:
    """Return the canonical label map {bnode -> _:c14nN} for the quads."""
    bnode_quads: dict[str, list] = {}
    for q in quads:
        s, p, o, g = q
        for term in (s, o, g):
            if term is not None and _is_bnode(term):
                bnode_quads.setdefault(term, []).append(q)

    canonical = _Issuer("_:c14n")
    if not bnode_quads:
        return {}

    def hash_first_degree(bid: str) -> str:
        nquads = []
        for q in bnode_quads[bid]:
            nquads.append(_quad_nquad(q, lambda t: "_:a" if t == bid else "_:z"))
        return hashlib.sha256("".join(n + "\n" for n in sorted(nquads)).encode("utf-8")).hexdigest()

    first_degree = {b: hash_first_degree(b) for b in bnode_quads}

    # issue canonical ids for unique first-degree hashes, in hash order
    by_hash: dict[str, list[str]] = {}
    for b, h in first_degree.items():
        by_hash.setdefault(h, []).append(b)
    non_unique: list[list[str]] = []
    for h in sorted(by_hash):
        group = by_hash[h]
        if len(group) == 1:
            canonical.issue(group[0])
        else:
            non_unique.append(sorted(group))

    def hash_related(related: str, quad, issuer: _Issuer, position: str) -> str:
        if canonical.has(related):
            ident = canonical.issued[related]
        elif issuer.has(related):
            ident = issuer.issued[related]
        else:
            ident = first_degree[related]
        inp = position
        if position != "g":
            inp += "<%s>" % quad[1]
        inp += ident
        return hashlib.sha256(inp.encode("utf-8")).hexdigest()

    def hash_n_degree(identifier: str, issuer: _Issuer, depth: int = 0):
        if depth > 32:  # defensive recursion guard (poison graphs)
            raise ValueError("urdna2015: graph too deep to canonicalize")
        hn: dict[str, list[str]] = {}
        for quad in bnode_quads[identifier]:
            s, p, o, g = quad
            for term, pos in ((s, "s"), (o, "o"), (g, "g")):
                if term is None or not _is_bnode(term) or term == identifier:
                    continue
                h = hash_related(term, quad, issuer, pos)
                group = hn.setdefault(h, [])
                if term not in group:
                    group.append(term)
        data_to_hash = ""
        for related_hash in sorted(hn):
            data_to_hash += related_hash
            chosen_path = ""
            chosen_issuer = None
            group = sorted(hn[related_hash])
            n_perms = 1
            for k in range(2, len(group) + 1):
                n_perms *= k
            if n_perms > max_permutations:
                raise ValueError("urdna2015: too many symmetric blank nodes")
            for perm in permutations(group):
                issuer_copy = issuer.clone()
                path = ""
                recursion_list = []
                skip = False
                for related in perm:
                    if canonical.has(related):
                        path += canonical.issued[related]
                    else:
                        if not issuer_copy.has(related):
                            recursion_list.append(related)
                        path += issuer_copy.issue(related)
                    if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                for related in recursion_list:
                    result_hash, result_issuer = hash_n_degree(related, issuer_copy, depth + 1)
                    path += issuer_copy.issue(related)
                    path += "<%s>" % result_hash
                    issuer_copy = result_issuer
                    if chosen_path and len(path) >= len(chosen_path) and path > chosen_path:
                        skip = True
                        break
                if skip:
                    continue
                if not chosen_path or path < chosen_path:
                    chosen_path = path
                    chosen_issuer = issuer_copy
            data_to_hash += chosen_path
            issuer = chosen_issuer if chosen_issuer is not None else issuer
        return hashlib.sha256(data_to_hash.encode("utf-8")).hexdigest(), issuer

    for group in non_unique:
        results = []
        for b in group:
            if canonical.has(b):
                continue
            temp = _Issuer("_:b")
            temp.issue(b)
            h, result_issuer = hash_n_degree(b, temp)
            results.append((h, result_issuer))
        for _h, result_issuer in sorted(results, key=lambda r: r[0]):
            for old in result_issuer.order:
                canonical.issue(old)

    return dict(canonical.issued)


def serialize_quads(quads, labels: dict[str, str] | None = None) -> str:
    """Sorted, deduped N-Quads text with optional bnode relabeling."""
    labels = labels or {}

    def rename(t: str) -> str:
        return labels.get(t, t)

    lines = {_quad_nquad(q, rename) for q in quads}
    return "".join(line + "\n" for line in sorted(lines))
