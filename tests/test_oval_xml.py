"""S3 OVAL XML scan: plain / gzip / bzip2 files through the binaryFile +
streaming-iterparse reader, asserting criteria-walk parity with the
reference semantics (nearest enclosing namespace test, negate polarity).
"""

from __future__ import annotations

import bz2
import gzip

import pytest

from vunnel_spark.sources.oval_xml import parse_oval_bytes, read_oval_xml

OVAL = """<?xml version="1.0" encoding="UTF-8"?>
<oval_definitions xmlns="http://oval.mitre.org/XMLSchema/oval-definitions-5">
  <definitions>
    <definition id="oval:test:def:1" class="vulnerability" version="1">
      <metadata>
        <title>CVE-2024-0001 on testos</title>
        <reference source="CVE" ref_id="CVE-2024-0001"/>
        <reference source="CVE" ref_id="CVE-2024-0002"/>
        <advisory><severity>High</severity></advisory>
      </metadata>
      <criteria operator="AND">
        <criterion test_ref="oval:test:tst:100" comment="testos 1 is installed"/>
        <criteria operator="OR">
          <criterion test_ref="oval:test:tst:200" comment="openssl is earlier than 3.0.1"/>
          <criterion test_ref="oval:test:tst:201" comment="zlib is earlier than 1.2.12" negate="true"/>
        </criteria>
      </criteria>
    </definition>
    <definition id="oval:test:def:2" class="vulnerability" version="1">
      <metadata>
        <title>CVE-2024-0003 on testos</title>
        <reference source="CVE" ref_id="CVE-2024-0003"/>
        <advisory><severity>Low</severity></advisory>
      </metadata>
    </definition>
  </definitions>
</oval_definitions>
"""


def test_parse_core_semantics():
    rows = parse_oval_bytes("f.xml", OVAL.encode())
    by_def = {}
    for r in rows:
        by_def.setdefault(r[1], []).append(r)
    d1 = by_def["oval:test:def:1"]
    # two package tests, both inheriting the nearest namespace test
    assert {(r[5], r[6], r[7]) for r in d1} == {
        ("oval:test:tst:100", "oval:test:tst:200", "affirm"),
        ("oval:test:tst:100", "oval:test:tst:201", "negate"),
    }
    assert d1[0][3] == "High"
    assert d1[0][4] == "CVE-2024-0001|CVE-2024-0002"
    # definition without criteria still yields one row (metadata only)
    d2 = by_def["oval:test:def:2"]
    assert len(d2) == 1 and d2[0][5] is None and d2[0][4] == "CVE-2024-0003"


@pytest.mark.parametrize("suffix", ["xml", "xml.gz", "xml.bz2"])
def test_read_all_compressions(spark, tmp_path, suffix):
    raw = OVAL.encode()
    if suffix.endswith(".gz"):
        raw = gzip.compress(raw)
    elif suffix.endswith(".bz2"):
        raw = bz2.compress(raw)
    p = tmp_path / f"com.testos.1.{suffix}"
    p.write_bytes(raw)

    df = read_oval_xml(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 3
    pkg_tests = {r.package_test for r in rows if r.package_test}
    assert pkg_tests == {"oval:test:tst:200", "oval:test:tst:201"}
    assert all(r.path.endswith(suffix) for r in rows)


def test_multiple_files_parallel_scan(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"release{i}.xml").write_bytes(
            OVAL.replace("oval:test:def:", f"oval:r{i}:def:").encode()
        )
    df = read_oval_xml(spark, str(tmp_path))
    assert df.count() == 9
    assert df.select("path").distinct().count() == 3
