"""Ports of the reference's identifier fixture table
(/root/reference/internal/common/identifier_test.go) over the on-disk
fixtures in internal/common/testdata/identifier/. Non-ignored cases
only, with the same expected strings (fmt.Sprint formatting)."""

import os

import pytest

from gleaner_ray.identifier import get_identifier_by_path, get_identifier_by_paths

D = "/root/reference/internal/common/testdata/identifier"

DOI_FILTER = "$.identifier[?(@.propertyID=='https://registry.identifiers.org/registry/doi')].value"
GRAPH_FILTER = "$['@graph'][?(@['@type']=='schema:Dataset')]['@id']"


def rd(name: str) -> str:
    return open(os.path.join(D, name)).read()


def sprint(result) -> str:
    return "[" + " ".join(result) + "]" if isinstance(result, list) else str(result)


# identifier_test.go TestValidJsonPathInput (single path)
SINGLE_CASES = [
    ("$['@id']", "jsonId.json", "[idenfitier]"),
    ("@.identifier", "jsonId.json", "[doi:10.1575/1912/bco-dmo.2343.1]"),
    ("$.identifier", "jsonId.json", "[doi:10.1575/1912/bco-dmo.2343.1]"),
    (
        "$.identifierSArray[?(@.propertyID=='https://registry.identifiers.org/registry/doi')].value",
        "jsonId.json",
        "[doi:10.1575/1912/bco-dmo.2343.1 doi:10.1575/1912/bco-dmo.2343.1N]",
    ),
    ("$.identifierObj.value", "jsonId.json", "[doi:10.1575/1912/bco-dmo.2343.1]"),
]


@pytest.mark.parametrize("path,fixture,expected", SINGLE_CASES)
def test_single_path(path, fixture, expected):
    assert sprint(get_identifier_by_path(path, rd(fixture))) == expected


# identifier_test.go TestValidJsonPathsInput (first-non-empty path wins)
MULTI_CASES = [
    ("$['@id']", "jsonIdPaths.json", "[idenfitier]", "$['@id']"),
    ("$['@id']", "jsonIdentifierPath.json", "[idenfitier]", "$['@id']"),
    ("$['@id']", "jsonIdentifierObjectPath.json", "[idenfitier]", "$['@id']"),
    ("$['@id']", "jsonIdentifierArraySingle.json", "[idenfitier]", "$['@id']"),
    ("$['@id']", "jsonIdentifierArrayMultiple.json", "[idenfitier]", "$['@id']"),
    (
        "$.identifier.value,$.identifier,$['@id']",
        "jsonIdPaths.json",
        "[idenfitier]",
        "$['@id']",
    ),
    (
        "$.identifier.value,$.identifier,$['@id']",
        "jsonIdentifierPath.json",
        "[doi:10]",
        "$.identifier",
    ),
    (
        "$.identifier['value'],$.identifier,$['@id']",
        "jsonIdentifierObjectPath.json",
        "[doi:10.1575/1912/bco-dmo.2343.1]",
        "$.identifier['value']",
    ),
    (
        "$.identifier.value,$.identifier,$['@id']",
        "jsonIdentifierObjectPath.json",
        "[doi:10.1575/1912/bco-dmo.2343.1]",
        "$.identifier.value",
    ),
    (
        DOI_FILTER + ",$.identifier.value,$.identifier.$['@id']",
        "jsonIdentifierArraySingle.json",
        "[doi:10.1575/1912/bco-dmo.2343.1]",
        DOI_FILTER,
    ),
    (
        DOI_FILTER + ",$.identifier.value,$.identifier,$['@id']",
        "jsonIdentifierArrayMultiple.json",
        "[doi:10.1575/1912/bco-dmo.2343.1 doi:10.1575/1912/bco-dmo.2343.1N]",
        DOI_FILTER,
    ),
    (
        DOI_FILTER + ",$.identifier.value,$.identifier,$['@id']",
        "problemChildIris.json",
        "[https://ds.iris.edu/ds/products/emtf/]",
        "$['@id']",
    ),
    (
        DOI_FILTER + ",$.identifier.value,$.identifier,$['@id']",
        "problemChildOpentop.json",
        "[OTDS.062020.32611.1]",
        "$.identifier.value",
    ),
    # TestValidJsonPathGraphInput
    (
        GRAPH_FILTER + "," + DOI_FILTER + ",$.identifier.value,$.identifier,$['@id']",
        "jsonIdentifierArrayMultiple.json",
        "[doi:10.1575/1912/bco-dmo.2343.1 doi:10.1575/1912/bco-dmo.2343.1N]",
        DOI_FILTER,
    ),
    (
        GRAPH_FILTER,
        "jsonGraphWifire.json",
        "[https://wifire-data.sdsc.edu/dataset/8fd44c38-f6d3-429c-a785-1498dfaa2a6a]",
        GRAPH_FILTER,
    ),
    (
        GRAPH_FILTER + "," + DOI_FILTER + ",$.identifier.value,$.identifier,$['@id']",
        "jsonGraphWifire.json",
        "[https://wifire-data.sdsc.edu/dataset/8fd44c38-f6d3-429c-a785-1498dfaa2a6a]",
        GRAPH_FILTER,
    ),
]


@pytest.mark.parametrize("paths,fixture,expected,expected_path", MULTI_CASES)
def test_multi_path_first_match(paths, fixture, expected, expected_path):
    result, matched = get_identifier_by_paths(paths.split(","), rd(fixture))
    assert sprint(result) == expected
    assert matched == expected_path
