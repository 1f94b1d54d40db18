"""secureos_pipeline branch semantics (secureos/parser.py:162-327).

Hand-built secdb frames hit every branch: the provider's simplified
apk comparator (numeric parts, revision split, non-numeric revision,
hyphen folding), real-then-special version ordering, whitespace vid
splitting with first-occurrence dedup, the per-(vid, pkg) first-real
range suppression vs the -r0 VulnerableRange on later revisions, the
CVE/GHSA/other link forms, and the fixdate Available join.
"""

from __future__ import annotations

from vunnel_spark.pipelines.secureos import (
    _compare_apk_versions,
    secureos_pipeline,
)

_SCHEMA = (
    "pos long, pkg string, "
    "secfixes array<struct<version string, vids array<string>>>"
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {
        r["Name"]: r.asDict(recursive=True)
        for r in secureos_pipeline(df, **kw).collect()
    }


def test_comparator_matches_reference_grammar():
    # numeric order, not lexicographic
    assert _compare_apk_versions("9.3.2-r2", "10.0.0-r0") == -1
    # revision breaks the tie
    assert _compare_apk_versions("9.3.2-r2", "9.3.2-r10") == -1
    # non-numeric revision -> 0
    assert _compare_apk_versions("1.0-rbeta", "1.0-r0") == 0
    # hyphens fold into dots before splitting
    assert _compare_apk_versions("1.0-beta", "1.0.beta") == 0
    # missing parts pad with 0
    assert _compare_apk_versions("1.2", "1.2.0") == 0
    assert _compare_apk_versions("1.2", "1.2.1") == -1
    # mixed int/str parts compare as strings
    assert _compare_apk_versions("1.2a", "1.10") == 1  # '2a' vs '10'


def test_versions_sorted_and_first_real_range_free(spark):
    out = _run(
        spark,
        [
            # map order deliberately NOT sorted: 1.2.0-r2 listed first;
            # sorted order is 1.1.0-r1 < 1.2.0-r2, so 1.1.0-r1 is the
            # first real for CVE-1/pkga and 1.2.0-r2 (revision 2 > 0)
            # gets the range
            (0, "pkga", [
                ("1.2.0-r2", ["CVE-1"]),
                ("1.1.0-r1", ["CVE-1"]),
                ("0", ["CVE-2"]),
            ]),
        ],
    )
    r1 = out["CVE-1"]
    assert [fi["Version"] for fi in r1["FixedIn"]] == ["1.1.0-r1", "1.2.0-r2"]
    assert r1["FixedIn"][0]["VulnerableRange"] is None
    assert r1["FixedIn"][1]["VulnerableRange"] == ">=1.2.0-r0, <1.2.0-r2"
    assert r1["FixedIn"][0]["VersionFormat"] == "apk"
    assert r1["NamespaceName"] == "secureos:rolling"
    assert r1["Severity"] == "Unknown"
    # special version '0': no range bookkeeping, appended after reals
    r2 = out["CVE-2"]
    assert [fi["Version"] for fi in r2["FixedIn"]] == ["0"]
    assert r2["FixedIn"][0]["VulnerableRange"] is None


def test_revision_zero_and_cross_package_independence(spark):
    out = _run(
        spark,
        [
            # second real version but revision 0 -> NO range
            (0, "pkga", [("1.0-r0", ["CVE-3"]), ("2.0-r0", ["CVE-3"])]),
            # same vid under another package: its own first is range-free
            (1, "pkgb", [("5.0-r1", ["CVE-3"])]),
        ],
    )
    fis = out["CVE-3"]["FixedIn"]
    assert [(fi["Name"], fi["Version"], fi["VulnerableRange"]) for fi in fis] == [
        ("pkga", "1.0-r0", None),
        ("pkga", "2.0-r0", None),
        ("pkgb", "5.0-r1", None),
    ]


def test_vid_split_and_dedup_and_links(spark):
    out = _run(
        spark,
        [
            (0, "pkga", [
                ("1.0-r1", ["CVE-4 GHSA-xxxx-yyyy-zzzz", "CVE-4", "XSA-99"]),
            ]),
        ],
    )
    assert set(out) == {"CVE-4", "GHSA-xxxx-yyyy-zzzz", "XSA-99"}
    assert out["CVE-4"]["Link"] == "https://security.secureos.io/CVE-4"
    assert (
        out["GHSA-xxxx-yyyy-zzzz"]["Link"]
        == "https://github.com/advisories/GHSA-xxxx-yyyy-zzzz"
    )
    assert out["XSA-99"]["Link"] == ""
    # dedup: CVE-4 listed twice under the same version -> one FixedIn
    assert len(out["CVE-4"]["FixedIn"]) == 1


def test_fixdate_available_join(spark):
    fixdates_rows = [
        ("CVE-5", "pkga", "1.0-r1", "secureos:rolling", "2025-03-01", "first-observed"),
        ("CVE-5", "pkga", "9.9-r9", "secureos:rolling", "2025-03-02", "first-observed"),
    ]
    import pyspark.sql.functions as F  # noqa: F401

    df_fix = None

    def run(spark):
        nonlocal df_fix
        df_fix = spark.createDataFrame(
            fixdates_rows,
            "vuln_id string, package string, fix_version string, "
            "ecosystem string, date string, kind string",
        )
        return _run(
            spark,
            [(0, "pkga", [("1.0-r1", ["CVE-5"]), ("2.0-r0", ["CVE-5"])])],
            fixdates=df_fix,
        )

    out = run(spark)
    fis = {fi["Version"]: fi for fi in out["CVE-5"]["FixedIn"]}
    assert fis["1.0-r1"]["Available"] == {
        "Date": "2025-03-01", "Kind": "first-observed",
    }
    assert fis["2.0-r0"]["Available"] is None


def test_namespace_and_release_parameterization(spark):
    out = _run(
        spark,
        [(0, "p", [("1.0-r1", ["CVE-6"])])],
        release="1.0",
        namespace="secureos",
    )
    assert out["CVE-6"]["NamespaceName"] == "secureos:1.0"
    assert out["CVE-6"]["FixedIn"][0]["NamespaceName"] == "secureos:1.0"


def test_plan_shape_two_shuffles_no_broadcast_of_corpus(spark):
    """Scale pin (docstring contract): the (vid, pkg) first-real pick is
    a window (one hash exchange), assembly is the second; the corpus-
    growing side is never a broadcast input (only the finder dim is)."""
    import datetime  # noqa: F401
    import re

    pk = spark.createDataFrame(
        [(0, "pkga", [("1.0-r1", ["CVE-1"])])], _SCHEMA
    )
    fx = spark.createDataFrame(
        [("CVE-1", "pkga", "1.0-r1", "secureos:rolling", "2025-01-01", "k")],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date string, kind string",
    )
    plan = (
        secureos_pipeline(pk, fixdates=fx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 1, plan  # the finder dim only
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert len(re.findall(r"Exchange (hash|range)", plan)) == 2, plan


def test_revision_int_semantics_sign_and_whitespace(spark):
    """Revision eligibility follows Python int() (parser.py:175), which
    the pandas-UDF comparator runs verbatim: '+2' and ' 2' parse (and
    '1_0' -> 10), so '1.0-r+2' as a non-first real EMITS the -r0 range
    — a bare ^\\d+$ gate would compute 0 and suppress it (r11 ADVICE)."""
    assert _compare_apk_versions("1.0-r0", "1.0-r+2") == -1
    out = _run(
        spark,
        [
            (0, "pkga", [
                ("1.0-r+2", ["CVE-9"]),
                ("1.0-r0", ["CVE-9"]),
            ]),
        ],
    )
    fis = out["CVE-9"]["FixedIn"]
    assert [fi["Version"] for fi in fis] == ["1.0-r0", "1.0-r+2"]
    assert fis[0]["VulnerableRange"] is None
    assert fis[1]["VulnerableRange"] == ">=1.0-r0, <1.0-r+2"


def test_best_refuses_special_fix_versions(spark):
    """fixdate.best returns None for falsy/'None'/'0' fix versions
    (finder.py:149-151): a store row keyed on the '0' special never
    attaches an Available, while the real version beside it does."""
    import datetime

    fixdates = spark.createDataFrame(
        [
            ("CVE-10", "pkga", "0", "secureos:rolling",
             datetime.date(2024, 1, 1), "first-observed"),
            ("CVE-10", "pkga", "1.0-r1", "secureos:rolling",
             datetime.date(2024, 1, 2), "first-observed"),
        ],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date date, kind string",
    )
    out = _run(
        spark,
        [(0, "pkga", [("1.0-r1", ["CVE-10"]), ("0", ["CVE-10"])])],
        fixdates=fixdates,
    )
    fis = out["CVE-10"]["FixedIn"]
    by_ver = {fi["Version"]: fi for fi in fis}
    assert by_ver["0"]["Available"] is None
    assert by_ver["1.0-r1"]["Available"] == {
        "Date": datetime.date(2024, 1, 2), "Kind": "first-observed"
    }
