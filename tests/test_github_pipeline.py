"""Golden test for the GitHub Security Advisory pipeline (SURVEY phase 9):
ecosystem mapping/drop, FixedIn 'None' fallback + comma strip, per-ecosystem
fan-out, severity normalization, CVE extraction."""

from __future__ import annotations

from vunnel_spark.pipelines.github import github_pipeline


def test_github_pipeline_semantics(spark):
    advisories = spark.createDataFrame(
        [
            ("GHSA-aaaa", "CRITICAL",
             ["GHSA-aaaa", "CVE-2020-5236", "CVE-2019-0001"], None),
            ("GHSA-bbbb", "WEIRD", ["GHSA-bbbb"], "2024-01-01"),
            ("GHSA-cccc", "LOW", ["GHSA-cccc", "CVE-2024-9"], None),  # only unmapped nodes
        ],
        "ghsa_id string, severity string, identifiers array<string>, withdrawn string",
    )
    nodes = spark.createDataFrame(
        [
            ("GHSA-aaaa", "PIP", "waitress", "1.4.3", ">= 1.2.0, < 1.4.3"),
            ("GHSA-aaaa", "PIP", "flask", None, "< 2.0"),
            ("GHSA-aaaa", "NPM", "lodash", "4.17.21", "< 4.17.21"),
            ("GHSA-bbbb", "MAVEN", "log4j", "2.17.0", "< 2.17.0"),
            ("GHSA-cccc", "DEB", "openssl", "3.0.1", "< 3.0.1"),  # unmapped -> dropped
        ],
        "ghsa_id string, github_ecosystem string, pkg string, "
        "first_patched string, vrange string",
    )
    rows = {r.identifier: r for r in github_pipeline(advisories, nodes).collect()}
    # per-(advisory, ecosystem) fan-out; unmapped-only advisory emits nothing
    assert set(rows) == {
        "github:python/ghsa-aaaa", "github:npm/ghsa-aaaa", "github:java/ghsa-bbbb",
    }
    py = rows["github:python/ghsa-aaaa"]
    # 'None' fallback for missing fix version; commas stripped from the range
    assert py.fixed_in == "flask:None:< 2.0|waitress:1.4.3:>= 1.2.0 < 1.4.3"
    assert py.n_fixes == 2
    assert py.severity == "Critical"
    assert py.cves == "CVE-2019-0001|CVE-2020-5236"
    assert rows["github:java/ghsa-bbbb"].severity == "Unknown"
    assert rows["github:java/ghsa-bbbb"].withdrawn == "2024-01-01"


def test_github_fixdate_lookup_store_only_best(spark):
    """r13: _fixedin's fixdater.best (github/parser.py:745-756) — the
    github Finder is store-only (default_finder: strategies=[], just the
    first-observed store), so best() is a guarded dim hit: falsy/'None'/
    '0' fix versions skip the lookup (finder.py:149-151), a store row
    appends available {date, kind} whether accurate or not, a miss
    leaves the record bare.  The lookup keys on the MAPPED ecosystem."""
    import datetime

    from vunnel_spark.pipelines.github import github_pipeline

    advisories = spark.createDataFrame(
        [("GHSA-aaaa", "LOW", ["GHSA-aaaa", "CVE-2024-1"], None)],
        "ghsa_id string, severity string, identifiers array<string>, withdrawn string",
    )
    nodes = spark.createDataFrame(
        [
            ("GHSA-aaaa", "PIP", "waitress", "1.4.3", "< 1.4.3"),   # store hit
            ("GHSA-aaaa", "PIP", "flask", None, "< 2.0"),            # falsy: no lookup
            ("GHSA-aaaa", "PIP", "jinja2", "0", "< 3.0"),            # '0': no lookup
            ("GHSA-aaaa", "PIP", "django", "4.2.1", "< 4.2.1"),      # store miss
        ],
        "ghsa_id string, github_ecosystem string, pkg string, "
        "first_patched string, vrange string",
    )
    fixdates = spark.createDataFrame(
        [
            ("GHSA-aaaa", "waitress", "python", "1.4.3",
             datetime.date(2020, 2, 4), "observed"),
            # '0' row present in the store: must NOT surface (guard fires first)
            ("GHSA-aaaa", "jinja2", "python", "0",
             datetime.date(2021, 1, 1), "observed"),
            # wrong ecosystem: github eco 'PIP' maps to 'python', not 'PIP'
            ("GHSA-aaaa", "django", "PIP", "4.2.1",
             datetime.date(2022, 3, 3), "observed"),
        ],
        "ghsa_id string, pkg string, ecosystem string, fix_version string, "
        "date date, kind string",
    )
    row = github_pipeline(advisories, nodes, fixdates).collect()[0]
    assert row.fixed_in == (
        "django:4.2.1:< 4.2.1|flask:None:< 2.0|jinja2:0:< 3.0"
        "|waitress:1.4.3:< 1.4.3:2020-02-04:observed"
    )
