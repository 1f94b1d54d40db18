"""Golden end-to-end test for the secdb pipeline (SURVEY §7.1 slice):
fixture secdb doc -> full pipeline -> envelope sink -> exact expected rows,
including rejection anti-join and first-observed enrichment semantics.
"""

from __future__ import annotations

import json

import pytest

from vunnel_spark.pipelines import secdb_pipeline

FIXTURE = {
    "distro": "testos",
    "urlprefix": "https://example.invalid",
    "apkurl": "{{urlprefix}}/{{repo}}",
    "packages": [
        {"pkg": {"name": "openssl", "secfixes": [
            {"version": "3.0.1", "ids": ["CVE-2024-0001 CVE-2024-0002"]},
            {"version": "3.0.2", "ids": ["CVE-2024-0003"]},
        ]}},
        {"pkg": {"name": "zlib", "secfixes": [
            {"version": "1.2.12", "ids": ["CVE-2024-0004", "NOT-A-CVE"]},
        ]}},
        {"pkg": {"name": "busybox", "secfixes": [
            {"version": "1.36.0", "ids": ["CVE-2024-0005"]},
        ]}},
    ],
}


@pytest.fixture()
def secdb_file(tmp_path):
    p = tmp_path / "security.json"
    p.write_text(json.dumps(FIXTURE))
    return str(p)


def test_pipeline_end_to_end(spark, secdb_file, tmp_path):
    rejections = spark.createDataFrame(
        [("busybox", "CVE-2024-0005")], "pkg string, vid string"
    )
    out = secdb_pipeline(
        spark,
        secdb_file,
        str(tmp_path / "ws"),
        state_path=str(tmp_path / "fixdates"),
        rejections=rejections,
        today="2026-08-13",
    )
    rows = {r.identifier: r for r in out.collect()}
    # multi-id string split into two CVEs; NOT-A-CVE filtered; rejection dropped
    assert set(rows) == {
        "testos/CVE-2024-0001", "testos/CVE-2024-0002",
        "testos/CVE-2024-0003", "testos/CVE-2024-0004",
    }
    r1 = rows["testos/CVE-2024-0001"]
    assert r1.schema == "schema/vulnerability/os/v1"
    assert [(f.Name, f.Version) for f in r1.item.FixedIn] == [("openssl", "3.0.1")]
    assert str(r1.item.earliest_fix_date) == "2026-08-13"

    # second run with a later 'today': first-observed dates must not move
    out2 = secdb_pipeline(
        spark,
        secdb_file,
        str(tmp_path / "ws"),
        state_path=str(tmp_path / "fixdates"),
        rejections=rejections,
        today="2026-12-31",
    )
    dates = {r.identifier: str(r.item.earliest_fix_date) for r in out2.collect()}
    assert set(dates.values()) == {"2026-08-13"}
