"""photon_pipeline branch semantics (photon/parser.py:52-141, 232-352).

Hand-built frames hit every branch: the BDSA/empty-id skips, the
Not-Affected and empty-pkg FixedIn drops (including the whole-record
drop when nothing survives), the first-non-Unknown severity scan over
ALL entries, res_ver 'NA'/empty -> 'None', the CVSS threshold tiers,
the wiki advisory map (filename filter, both issue-date spellings,
missing-field drops, earliest-date-wins), and the two-tier fix-date
patch (advisory date beats the finder; 'None'/'0' never eligible).
"""

from __future__ import annotations

from vunnel_spark.pipelines.photon import (
    advisory_map,
    photon_pipeline,
)

_ENTRY_SCHEMA = (
    "photon_version string, pos long, cve_id string, pkg string, "
    "cve_score double, status string, res_ver string"
)


def _rows(df):
    return {r["Name"]: r.asDict(recursive=True) for r in df.collect()}


def test_advisory_map_parse_and_earliest_wins(spark):
    files = spark.createDataFrame(
        [
            # versioned PHSA id + 'Issue date' spelling
            ("Security-Update-3.0-0100.md",
             "Advisory Id : PHSA-2021-3.0-0100\nIssue date: 2021-05-01\n"
             "fixes CVE-2021-1 and CVE-2021-2 and CVE-2021-1"),
            # same (version, cve) pair, EARLIER date -> must win;
            # short PHSA id + 'Issued on' spelling + plural filename
            ("Security-Updates-3.0-0099.md",
             "Advisory ID: PHSA-2017-0099\nIssued on: 2021-04-30\n"
             "also CVE-2021-1"),
            # missing issue date -> drops whole
            ("Security-Update-3.0-0101.md",
             "Advisory Id : PHSA-2021-3.0-0101\nCVE-2021-3"),
            # no CVE ids -> drops whole
            ("Security-Update-3.0-0102.md",
             "Advisory Id : PHSA-2021-3.0-0102\nIssue date: 2021-06-01"),
            # filename doesn't match -> drops whole
            ("Home.md", "Advisory Id : PHSA-2021-3.0-0103\n"
             "Issue date: 2021-06-01\nCVE-2021-4"),
        ],
        "filename string, content string",
    )
    out = {
        (r["version"], r["cve_id"]): r.asDict() for r in advisory_map(files).collect()
    }
    assert set(out) == {("3.0", "CVE-2021-1"), ("3.0", "CVE-2021-2")}
    # earliest date wins for CVE-2021-1
    a = out[("3.0", "CVE-2021-1")]
    assert a["advisory_id"] == "PHSA-2017-0099"
    assert a["advisory_date"] == "2021-04-30"
    assert a["advisory_url"].endswith("/wiki/Security-Updates-3.0-0099")
    b = out[("3.0", "CVE-2021-2")]
    assert b["advisory_id"] == "PHSA-2021-3.0-0100"
    assert b["advisory_url"].endswith("/wiki/Security-Update-3.0-0100")


def test_record_assembly_and_severity_scan(spark):
    entries = spark.createDataFrame(
        [
            # CVE-2025-1: first entry unscored + Not Affected (drops from
            # FixedIn but still scanned — scores Unknown), second scored
            # 7.5 -> High, third scored 9.9 must NOT override
            ("4.0", 0, "CVE-2025-1", "liba", None, "Not Affected", "1.0-1"),
            ("4.0", 1, "CVE-2025-1", "libb", 7.5, "Affected", "NA"),
            ("4.0", 2, "CVE-2025-1", "libc", 9.9, "Affected", "2.0-1"),
            # CVE-2025-2: all entries drop (Not Affected / empty pkg)
            # -> NO record at all
            ("4.0", 3, "CVE-2025-2", "libd", 9.0, "Not Affected", "1-1"),
            ("4.0", 4, "CVE-2025-2", "", 9.0, "Affected", "1-1"),
            # BDSA (any case) and empty ids skip entirely
            ("4.0", 5, "bdsa-2025-3", "libe", 5.0, "Affected", "1-1"),
            ("4.0", 6, "BDSA-2025-4", "libe", 5.0, "Affected", "1-1"),
            ("4.0", 7, "", "libe", 5.0, "Affected", "1-1"),
            ("4.0", 8, None, "libe", 5.0, "Affected", "1-1"),
            # CVE-2025-5: no entry ever scores -> Unknown; empty res_ver
            # -> Version 'None'; same CVE in ANOTHER photon version is a
            # separate record (namespace key)
            ("4.0", 9, "CVE-2025-5", "libf", None, "Affected", ""),
            ("5.0", 0, "CVE-2025-5", "libf", 3.9, "Affected", "1-1"),
        ],
        _ENTRY_SCHEMA,
    )
    out = photon_pipeline(entries)
    recs = {(r["NamespaceName"], r["Name"]): r.asDict(recursive=True) for r in out.collect()}
    assert set(recs) == {
        ("photon:4.0", "CVE-2025-1"),
        ("photon:4.0", "CVE-2025-5"),
        ("photon:5.0", "CVE-2025-5"),
    }
    r1 = recs[("photon:4.0", "CVE-2025-1")]
    assert r1["Severity"] == "High"  # first scoring entry, not the max
    assert [fi["Name"] for fi in r1["FixedIn"]] == ["libb", "libc"]
    assert [fi["Version"] for fi in r1["FixedIn"]] == ["None", "2.0-1"]
    assert r1["FixedIn"][0]["VersionFormat"] == "rpm"
    assert r1["FixedIn"][0]["VendorAdvisory"] is None
    assert r1["Link"] == "https://www.cve.org/CVERecord?id=CVE-2025-1"
    assert r1["Description"] == "" and r1["CVSS"] == []
    assert r1["Metadata"]["Issued"] is None
    assert recs[("photon:4.0", "CVE-2025-5")]["Severity"] == "Unknown"
    # 3.9 -> Low tier
    assert recs[("photon:5.0", "CVE-2025-5")]["Severity"] == "Low"


def test_cvss_tiers(spark):
    entries = spark.createDataFrame(
        [
            ("3.0", 0, "CVE-1", "p", 9.0, "Affected", "1"),
            ("3.0", 1, "CVE-2", "p", 8.9, "Affected", "1"),
            ("3.0", 2, "CVE-3", "p", 4.0, "Affected", "1"),
            ("3.0", 3, "CVE-4", "p", 0.1, "Affected", "1"),
            ("3.0", 4, "CVE-5", "p", 0.0, "Affected", "1"),
            # null status is not 'Not Affected' -> entry survives
            ("3.0", 5, "CVE-6", "p", None, None, "1"),
        ],
        _ENTRY_SCHEMA,
    )
    sev = {r["Name"]: r["Severity"] for r in photon_pipeline(entries).collect()}
    assert sev == {
        "CVE-1": "Critical", "CVE-2": "High", "CVE-3": "Medium",
        "CVE-4": "Low", "CVE-5": "Negligible", "CVE-6": "Unknown",
    }


def test_advisory_join_and_fixdate_patch(spark):
    entries = spark.createDataFrame(
        [
            # advisory hit: VendorAdvisory + Issued + advisory-date
            # Available (beats the finder's competing row)
            ("3.0", 0, "CVE-2021-1", "pkga", 5.0, "Affected", "1.0-2"),
            # no advisory, finder hit -> finder date/kind
            ("3.0", 1, "CVE-2021-9", "pkgb", 5.0, "Affected", "2.0-1"),
            # no advisory, finder knows a row but for another version
            # -> no Available
            ("3.0", 2, "CVE-2021-9", "pkgc", 5.0, "Affected", "3.0-1"),
            # Version 'None' (res_ver NA) never eligible even with an
            # advisory present
            ("3.0", 3, "CVE-2021-1", "pkgd", 5.0, "Affected", "NA"),
        ],
        _ENTRY_SCHEMA,
    )
    advisories = spark.createDataFrame(
        [("3.0", "CVE-2021-1", "PHSA-2021-3.0-0100", "2021-05-01",
          "https://github.com/vmware/photon/wiki/Security-Update-3.0-0100")],
        "version string, cve_id string, advisory_id string, "
        "advisory_date string, advisory_url string",
    )
    fixdates = spark.createDataFrame(
        [
            ("CVE-2021-1", "pkga", "1.0-2", "photon:3.0", "2021-06-30", "first-observed"),
            ("CVE-2021-9", "pkgb", "2.0-1", "photon:3.0", "2021-07-01", "first-observed"),
            ("CVE-2021-9", "pkgc", "9.9-9", "photon:3.0", "2021-07-02", "first-observed"),
        ],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date string, kind string",
    )
    out = _rows(photon_pipeline(entries, advisories, fixdates))
    r1 = out["CVE-2021-1"]
    assert r1["Metadata"]["Issued"] == "2021-05-01"
    fi = {f["Name"]: f for f in r1["FixedIn"]}
    assert fi["pkga"]["VendorAdvisory"]["AdvisorySummary"][0]["ID"] == "PHSA-2021-3.0-0100"
    # advisory date wins over the finder's 2021-06-30
    assert fi["pkga"]["Available"] == {"Date": "2021-05-01", "Kind": "advisory"}
    # 'None' version: advisory metadata still attaches, no Available
    assert fi["pkgd"]["Available"] is None
    assert fi["pkgd"]["VendorAdvisory"] is not None
    r9 = out["CVE-2021-9"]
    fi9 = {f["Name"]: f for f in r9["FixedIn"]}
    assert fi9["pkgb"]["Available"] == {"Date": "2021-07-01", "Kind": "first-observed"}
    assert fi9["pkgc"]["Available"] is None
    assert r9["Metadata"]["Issued"] is None


def test_plan_shape_single_shuffle_broadcast_dims(spark):
    """Scale pin (docstring contract): both dimensions broadcast and the
    fact table shuffles exactly once, on the record key."""
    import re

    entries = spark.createDataFrame(
        [("3.0", 0, "CVE-1", "p", 5.0, "Affected", "1")], _ENTRY_SCHEMA
    )
    advisories = spark.createDataFrame(
        [("3.0", "CVE-1", "PHSA-1", "2021-01-01", "u")],
        "version string, cve_id string, advisory_id string, "
        "advisory_date string, advisory_url string",
    )
    fixdates = spark.createDataFrame(
        [("CVE-1", "p", "1", "photon:3.0", "2021-01-02", "k")],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date string, kind string",
    )
    plan = (
        photon_pipeline(entries, advisories, fixdates)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 1, plan


def test_filename_prefix_match_plus_endswith_md(spark):
    """The reference filters with re.match (START-anchored only) plus a
    separate endswith('.md') check (photon/parser.py:78, 116-118) — so
    'Security-Update-3.0-123.md.md' parses (version 3.0, url strips
    only the FINAL '.md'), while a prefix match that doesn't end in
    '.md' drops."""
    files = spark.createDataFrame(
        [
            ("Security-Update-3.0-123.md.md",
             "Advisory Id : PHSA-2021-3.0-0123\nIssue date: 2021-07-01\n"
             "CVE-2021-9"),
            # regex prefix matches but endswith('.md') fails -> drop
            ("Security-Update-3.0-124.md.bak",
             "Advisory Id : PHSA-2021-3.0-0124\nIssue date: 2021-07-02\n"
             "CVE-2021-10"),
        ],
        "filename string, content string",
    )
    out = {
        (r["version"], r["cve_id"]): r.asDict()
        for r in advisory_map(files).collect()
    }
    assert set(out) == {("3.0", "CVE-2021-9")}
    assert out[("3.0", "CVE-2021-9")]["advisory_url"].endswith(
        "/wiki/Security-Update-3.0-123.md"
    )
