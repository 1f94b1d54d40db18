"""Golden tests for the OVAL criteria-tree flattener (E3/E4/F4) —
including the reference's nesting/inheritance quirks."""

from __future__ import annotations

import json

from vunnel_spark.operators.oval import flatten_criteria, flatten_criteria_json

TREE = {
    "operator": "AND",
    "criterions": [{"test_ref": "ns:rhel8"}],
    "children": [
        {
            "operator": "OR",
            "criterions": [
                {"test_ref": "pkg:openssl"},
                {"test_ref": "pkg:zlib", "negate": True},
            ],
            "children": [
                {
                    "operator": "AND",
                    "criterions": [
                        {"test_ref": "ns:rhel8-aus"},
                        {"test_ref": "pkg:kernel"},
                    ],
                }
            ],
        }
    ],
}


def test_flatten_pairs_with_nearest_namespace():
    rows = flatten_criteria_json("d1", json.dumps(TREE))
    assert ("d1", "ns:rhel8", "pkg:openssl", "affirm") in rows
    assert ("d1", "ns:rhel8", "pkg:zlib", "negate") in rows
    # nested group overrides the namespace test for its own criterions
    assert ("d1", "ns:rhel8-aus", "pkg:kernel", "affirm") in rows
    assert len(rows) == 3


def test_flatten_empty_and_broken():
    assert flatten_criteria_json("d", "") == []
    assert flatten_criteria_json("d", "null") == []
    assert flatten_criteria_json("d", "{not json") == [("d", None, None, "parse_error")]


def test_flatten_criteria_spark(spark):
    df = spark.createDataFrame(
        [("d1", json.dumps(TREE)), ("d2", json.dumps({"criterions": [{"test_ref": "pkg:lone"}]}))],
        "doc_id string, criteria string",
    )
    rows = {tuple(r) for r in flatten_criteria(df).collect()}
    assert ("d1", "ns:rhel8", "pkg:openssl", "affirm") in rows
    # package test with no enclosing namespace test -> null ns (caller decides)
    assert ("d2", None, "pkg:lone", "affirm") in rows
    assert len(rows) == 4
