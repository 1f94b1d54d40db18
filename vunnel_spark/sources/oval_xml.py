"""S3: real OVAL XML scan — binaryFile + streaming iterparse flatMap.

The reference parses vulnerability-class OVAL XML (plain, .gz or .bz2)
with a streaming SAX-style iterparse so huge files never load into memory
(/root/reference/src/vunnel/utils/oval_v2.py:443-495; element regex
config 33-76; criteria semantics 139-271).

Spark form (SURVEY's fallback for the missing spark-xml package):

    spark.read.format("binaryFile")  ->  one row per OVAL file
    -> mapInPandas: per file, decompress-on-the-fly + iterparse, clearing
       elements as they complete (constant memory per task, like the
       reference), emitting one relational row per (definition,
       package-test) pair — the same rows operators/oval.py produces from
       JSON-shaped trees.

Scale notes: parallelism is per-file (binaryFile never splits), which
matches the data: distros ship many OVAL files (one per release/arch).
A single pathological multi-GB file is one task — the same boundary the
reference has, minus its single-process limit on everything else.
"""

from __future__ import annotations

import bz2
import gzip
import io
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

OVAL_ROWS_SCHEMA = (
    "path string, definition_id string, title string, severity string, "
    "cves string, namespace_test string, package_test string, polarity string"
)

#: criterion comments that mark the namespace (distro-release) test, per the
#: reference's config regexes (oval_v2.py:54-76 OVALParserConfig)
_NS_COMMENT_RE = re.compile(r"is installed$")


def _open_stream(path: str, content: bytes):
    if path.endswith(".gz"):
        return gzip.GzipFile(fileobj=io.BytesIO(content))
    if path.endswith(".bz2"):
        return bz2.BZ2File(io.BytesIO(content))
    return io.BytesIO(content)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _walk_criteria(elem, ns_test, out):
    """Depth-first criteria walk, preserving the reference quirk: package
    tests pair with the nearest enclosing namespace test (oval_v2.py:181-241,
    same semantics as operators/oval.py _walk)."""
    for child in elem:
        tag = _local(child.tag)
        if tag == "criterion":
            comment = child.get("comment", "")
            ref = child.get("test_ref")
            if ref is None:
                continue
            if _NS_COMMENT_RE.search(comment):
                ns_test = ref
            else:
                polarity = "negate" if child.get("negate") == "true" else "affirm"
                out.append((ns_test, ref, polarity))
        elif tag == "criteria":
            ns_test = _walk_criteria(child, ns_test, out)
    return ns_test


def criteria_to_tree(elem) -> dict:
    """XML criteria element -> the JSON tree shape the E3/E4 walkers consume
    (``operators/oval.py``): operator + criterion comments/refs + children.

    Bridges the streaming XML scan to ``flatten_criteria_ctx`` so
    module/arch-bearing OVAL (Oracle ELSA with module streams) flattens
    with inherited context instead of losing it at parse time.
    """
    node = {
        "operator": elem.get("operator", "AND"),
        "criterions": [],
        "children": [],
    }
    for child in elem:
        tag = _local(child.tag)
        if tag == "criterion":
            crit = {"comment": child.get("comment", "")}
            if child.get("test_ref") is not None:
                crit["test_ref"] = child.get("test_ref")
            if child.get("negate") == "true":
                crit["negate"] = True
            node["criterions"].append(crit)
        elif tag == "criteria":
            node["children"].append(criteria_to_tree(child))
    return node


def parse_oval_bytes(path: str, content: bytes) -> list[tuple]:
    """Pure-python core (unit-testable without Spark): stream one OVAL file
    into (path, definition_id, title, severity, cves, ns_test, pkg_test,
    polarity) rows."""
    from xml.etree.ElementTree import iterparse  # noqa: S405 - trusted feeds

    rows: list[tuple] = []
    with _open_stream(path, content) as f:
        for _event, elem in iterparse(f, events=("end",)):
            if _local(elem.tag) != "definition":
                continue
            def_id = elem.get("id")
            title = severity = None
            cves: list[str] = []
            pairs: list[tuple] = []
            for child in elem.iter():
                tag = _local(child.tag)
                if tag == "title" and title is None:
                    title = (child.text or "").strip()
                elif tag == "severity" and severity is None:
                    severity = (child.text or "").strip()
                elif tag == "reference" and child.get("source", "CVE") == "CVE":
                    rid = child.get("ref_id")
                    if rid:
                        cves.append(rid)
            for child in elem:
                if _local(child.tag) == "criteria":
                    _walk_criteria(child, None, pairs)
            cve_str = "|".join(sorted(set(cves)))
            if pairs:
                rows.extend(
                    (path, def_id, title, severity, cve_str, ns, pkg, pol)
                    for ns, pkg, pol in pairs
                )
            else:
                rows.append((path, def_id, title, severity, cve_str, None, None, None))
            # constant memory: drop the subtree once processed (the
            # reference clears elements the same way, oval_v2.py:491)
            elem.clear()
    return rows


def read_oval_xml(spark: SparkSession, path: str) -> DataFrame:
    """Scan OVAL XML files (plain/.gz/.bz2) into relational criteria rows.

    One task per file; each task streams its file with constant memory.
    """

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = [c.split(" ")[0] for c in OVAL_ROWS_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[tuple] = []
            for path_v, content_v in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_oval_bytes(path_v, content_v))
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(gen, OVAL_ROWS_SCHEMA)
