"""OVAL criteria-tree flattening (SURVEY E3/E4, F4).

The reference walks recursive AND/OR criteria trees per definition
(/root/reference/src/vunnel/utils/oval_v2.py:139-271; oracle variant with
inherited context: providers/oracle/oval_parser.py:209-247), emitting
which (namespace_test, package_test) pairs gate a vulnerability.

Spark form: a UDTF-shaped ``mapInPandas`` — one document row in, many
typed rows out — applied at parse time.  The tree arrives as a JSON
column (from spark-xml, from_json, or raw); recursion happens in Python
once per document, after which everything downstream is relational.

Quirk preserved deliberately: like the reference (oval_v2.py:181-241),
an AND group pairs its namespace test with package tests found in its
OR subtrees; nested groups inherit the nearest enclosing namespace test.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame

CRITERIA_ROWS_SCHEMA = (
    "doc_id string, namespace_test string, package_test string, polarity string"
)


def _walk(node: dict, ns_test: str | None, out: list, is_ns) -> None:
    """Depth-first walk: criterions classify as namespace- or package-tests
    via ``is_ns``; package tests pair with the nearest enclosing ns test."""
    for crit in node.get("criterions", []) or []:
        ref = crit.get("test_ref")
        if ref is None:
            continue
        if is_ns(ref):
            ns_test = ref
        else:
            out.append((ns_test, ref, "negate" if crit.get("negate") else "affirm"))
    for child in node.get("children", []) or []:
        _walk(child, ns_test, out, is_ns)


def flatten_criteria_json(doc_id: str, criteria_json: str, ns_prefix: str = "ns:") -> list[tuple]:
    """Pure-python core (unit-testable without Spark)."""
    try:
        tree = json.loads(criteria_json) if criteria_json else None
    except (ValueError, TypeError):
        return [(doc_id, None, None, "parse_error")]
    if not tree:
        return []
    out: list = []
    _walk(tree, None, out, lambda ref: ref.startswith(ns_prefix))
    return [(doc_id, ns, pkg, pol) for ns, pkg, pol in out]


def flatten_criteria(
    df: DataFrame, id_col: str = "doc_id", criteria_col: str = "criteria", ns_prefix: str = "ns:"
) -> DataFrame:
    """(id, criteria_json) -> exploded (doc_id, namespace_test,
    package_test, polarity) rows via Arrow-batched mapInPandas."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                rows.extend(flatten_criteria_json(str(r[id_col]), r[criteria_col], ns_prefix))
            yield pd.DataFrame(
                rows, columns=["doc_id", "namespace_test", "package_test", "polarity"]
            )

    return df.select(id_col, criteria_col).mapInPandas(gen, CRITERIA_ROWS_SCHEMA)
