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
