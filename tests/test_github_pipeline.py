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


def test_fixdate_key_normalization(spark):
    """r13 fidelity find: the fixdate store key space is NORMALIZED on
    both sides — finder._normalize_ecosystem (finder.py:109-115, lower +
    the syft-type mapping with identity fallback, falsy passthrough) and
    normalize_package_name (ecosystem.py — strip + PEP-503 '_'/'.'->'-'
    for the python family).  A github 'java' record therefore probes the
    store as 'java-archive', and a PyPI 'foo_bar' as 'foo-bar'."""
    import datetime

    from pyspark.sql import functions as F

    from vunnel_spark.functions.fixdate import (
        normalize_fixdate_ecosystem,
        normalize_fixdate_package,
    )
    from vunnel_spark.pipelines.github import github_pipeline

    df = spark.createDataFrame(
        [("MAVEN",), ("java",), ("Rust",), ("pip",), ("apk",), ("",), (None,)],
        "eco string",
    )
    got = dict(
        df.select("eco", normalize_fixdate_ecosystem(F.col("eco")).alias("n"))
        .collect()
    )
    assert got == {"MAVEN": "java-archive", "java": "java-archive",
                   "Rust": "rust-crate", "pip": "python", "apk": "apk",
                   "": "", None: None}

    pk = spark.createDataFrame(
        [(" foo_bar.baz ", "python"), (" foo_bar.baz ", "gem")],
        "pkg string, eco string",
    )
    pks = [r.n for r in pk.select(
        normalize_fixdate_package(F.col("pkg"), F.col("eco")).alias("n")
    ).collect()]
    assert pks == ["foo-bar-baz", "foo_bar.baz"]

    # end-to-end: a java node hits a dim row stored under 'java-archive',
    # and a python node with an underscore hits its PEP-503-normalized row
    advisories = spark.createDataFrame(
        [("GHSA-x", "LOW", ["GHSA-x"], None)],
        "ghsa_id string, severity string, identifiers array<string>, withdrawn string",
    )
    nodes = spark.createDataFrame(
        [
            ("GHSA-x", "MAVEN", "log4j", "2.17.0", "< 2.17.0"),
            ("GHSA-x", "PIP", "fla_sk", "2.0.1", "< 2.0.1"),
        ],
        "ghsa_id string, github_ecosystem string, pkg string, "
        "first_patched string, vrange string",
    )
    fixdates = spark.createDataFrame(
        [
            ("GHSA-x", "log4j", "java-archive", "2.17.0",
             datetime.date(2021, 12, 18), "observed"),
            ("GHSA-x", "fla-sk", "python", "2.0.1",
             datetime.date(2021, 5, 1), "observed"),
        ],
        "ghsa_id string, pkg string, ecosystem string, fix_version string, "
        "date date, kind string",
    )
    rows = {r.identifier: r
            for r in github_pipeline(advisories, nodes, fixdates).collect()}
    assert rows["github:java/ghsa-x"].fixed_in == \
        "log4j:2.17.0:< 2.17.0:2021-12-18:observed"
    # the record keeps the RAW package name; only the probe normalized
    assert rows["github:python/ghsa-x"].fixed_in == \
        "fla_sk:2.0.1:< 2.0.1:2021-05-01:observed"
