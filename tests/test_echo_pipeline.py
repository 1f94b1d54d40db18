"""echo_pipeline branch semantics (echo/parser.py:77-132).

Hand-built advisory frames hit every branch of the reference's
``_normalize``: the TEMP-* skip, first-encounter severity (later
packages never update the record), missing severity -> Unknown, the
three reference-link forms (CVE-*, GHSA-*, linkless), missing
fixed_version -> '', FixedIn in input order, and the fixdate finder's
Available overlay (only when the finder knows a date for that exact
(vuln, package, version) key).
"""

from __future__ import annotations

from vunnel_spark.pipelines.echo import echo_pipeline


def _frames(spark):
    # pos = package-major input order of the source JSON walk
    advisories = spark.createDataFrame(
        [
            # pkga first: creates CVE-1 (severity High wins), CVE-2 (no
            # severity key -> Unknown), and a TEMP- placeholder (skipped)
            (0, "pkga", "CVE-1", "High", "1.2-1"),
            (1, "pkga", "CVE-2", None, None),
            (2, "pkga", "TEMP-0001-ABCD", "Critical", "9.9-9"),
            # pkgb second: CVE-1 again (Low must NOT override High; its
            # FixedIn appends AFTER pkga's), plus a GHSA and a linkless id
            (3, "pkgb", "CVE-1", "Low", "2.0-1"),
            (4, "pkgb", "GHSA-xxxx-yyyy-zzzz", "Medium", "0.5-0"),
            (5, "pkgb", "DLA-123-1", "Low", ""),
        ],
        "pos int, package string, cve_id string, severity string, "
        "fixed_version string",
    )
    fixdates = spark.createDataFrame(
        [
            # matches pkga's CVE-1 entry exactly -> Available
            ("CVE-1", "pkga", "1.2-1", "2025-02-03", "first-observed"),
            # right vuln+package, WRONG version -> no Available
            ("CVE-1", "pkgb", "9.9-9", "2025-02-04", "first-observed"),
            # finder row with no date -> never attaches (parser.py:127)
            ("CVE-2", "pkga", "", None, "advisory"),
        ],
        "vuln_id string, package string, fix_version string, "
        "date string, kind string",
    )
    return advisories, fixdates


def test_echo_pipeline_branches(spark):
    advisories, fixdates = _frames(spark)
    out = {
        r["Name"]: r.asDict(recursive=True)
        for r in echo_pipeline(advisories, fixdates=fixdates).collect()
    }
    # TEMP- dropped; everything else survives
    assert set(out) == {"CVE-1", "CVE-2", "GHSA-xxxx-yyyy-zzzz", "DLA-123-1"}

    c1 = out["CVE-1"]
    assert c1["NamespaceName"] == "echo:rolling"
    assert c1["Severity"] == "High"  # first encounter wins, Low ignored
    assert c1["Link"] == "https://www.cve.org/CVERecord?id=CVE-1"
    assert [f["Name"] for f in c1["FixedIn"]] == ["pkga", "pkgb"]  # input order
    assert c1["FixedIn"][0]["Version"] == "1.2-1"
    assert c1["FixedIn"][0]["VersionFormat"] == "dpkg"
    assert c1["FixedIn"][0]["NamespaceName"] == "echo:rolling"
    assert c1["FixedIn"][0]["Available"] == {
        "Date": "2025-02-03",
        "Kind": "first-observed",
    }
    assert c1["FixedIn"][1]["Available"] is None  # version mismatch

    c2 = out["CVE-2"]
    assert c2["Severity"] == "Unknown"        # missing severity
    assert c2["FixedIn"][0]["Version"] == ""  # missing fixed_version
    assert c2["FixedIn"][0]["Available"] is None  # dateless finder row

    assert (
        out["GHSA-xxxx-yyyy-zzzz"]["Link"]
        == "https://github.com/advisories/GHSA-xxxx-yyyy-zzzz"
    )
    assert out["DLA-123-1"]["Link"] == ""  # build_reference_links -> None


def test_echo_pipeline_without_finder(spark):
    advisories, _ = _frames(spark)
    rows = echo_pipeline(advisories, namespace="echo", release="v1").collect()
    by_name = {r["Name"]: r.asDict(recursive=True) for r in rows}
    assert by_name["CVE-1"]["NamespaceName"] == "echo:v1"
    assert all(
        f["Available"] is None
        for r in by_name.values()
        for f in r["FixedIn"]
    )


def test_best_refuses_special_fix_versions(spark):
    """fixdate.best returns None outright for falsy/'None'/'0' fix
    versions (finder.py:149-151), so a store row keyed on an empty or
    special version must never attach an Available."""
    adv = spark.createDataFrame(
        [
            (0, "pkga", "CVE-1", "low", ""),
            (1, "pkgb", "CVE-1", "low", "None"),
            (2, "pkgc", "CVE-1", "low", "1.2-1"),
        ],
        "pos long, package string, cve_id string, severity string, "
        "fixed_version string",
    )
    fixdates = spark.createDataFrame(
        [
            ("CVE-1", "pkga", "", "2024-01-01", "first-observed"),
            ("CVE-1", "pkgb", "None", "2024-01-02", "first-observed"),
            ("CVE-1", "pkgc", "1.2-1", "2024-01-03", "first-observed"),
        ],
        "vuln_id string, package string, fix_version string, "
        "date string, kind string",
    )
    out = {
        r["Name"]: r.asDict(recursive=True)
        for r in echo_pipeline(adv, fixdates=fixdates).collect()
    }
    fis = out["CVE-1"]["FixedIn"]
    assert fis[0]["Available"] is None   # '' ineligible
    assert fis[1]["Available"] is None   # 'None' ineligible
    assert fis[2]["Available"] == {"Date": "2024-01-03",
                                   "Kind": "first-observed"}
