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


def test_vid_dedup_prefix_filter_and_wolfi_mode(spark, tmp_path):
    """Per-entry vid dedup (the reference's seen-list, wolfi/parser.py:
    208-214), alpine's PREFIX-ONLY ^CVE- filter ('CVE-bogus' passes,
    alpine/parser.py:266-268), and the wolfi family's no-filter mode."""
    import json
    import os

    from vunnel_spark.pipelines.secdb import secdb_pipeline

    doc = {
        "distro": "wolfi",
        "urlprefix": "u",
        "apkurl": "a",
        "packages": [
            {"pkg": {"name": "busybox", "secfixes": [
                # duplicate vid WITHIN one entry dedups; across entries
                # each (vid, version) appends
                {"version": "1.35.0-r3",
                 "ids": ["CVE-2022-1 CVE-2022-1", "CVE-2022-1", "CVE-bogus",
                          "GHSA-xxxx-yyyy"]},
            ]}},
        ],
    }
    p = tmp_path / "security.json"
    p.write_text(json.dumps(doc))

    out_alpine = secdb_pipeline(
        spark, str(p), str(tmp_path / "out1")
    )
    ids_alpine = sorted(r.identifier for r in out_alpine.collect())
    assert ids_alpine == ["wolfi/CVE-2022-1", "wolfi/CVE-bogus"]
    fi = {
        r.identifier: r.item.FixedIn
        for r in out_alpine.collect()
    }
    # deduped: ONE FixedIn entry despite three mentions in the entry
    assert [f.asDict() for f in fi["wolfi/CVE-2022-1"]] == [
        {"Name": "busybox", "Version": "1.35.0-r3"}
    ]

    out_wolfi = secdb_pipeline(
        spark, str(p), str(tmp_path / "out2"), cve_only=False
    )
    ids_wolfi = sorted(r.identifier for r in out_wolfi.collect())
    assert ids_wolfi == [
        "wolfi/CVE-2022-1", "wolfi/CVE-bogus", "wolfi/GHSA-xxxx-yyyy"
    ]
