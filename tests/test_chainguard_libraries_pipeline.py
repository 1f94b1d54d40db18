"""openvex_pipeline branch semantics (chainguard_libraries/
openvex_parser.py:140-270).

Hand-built OpenVEX documents hit every branch: nameless-statement
drops, last-statement-wins per document, the product filter (purl
fallback to @id, pypi '+cgr.' / maven '.cgr.' fragments, missing
version, unsupported types), the status contract, the advisory-
timestamp candidate vs accurate store hits, and fixes ordering.
"""

from __future__ import annotations

from vunnel_spark.pipelines.chainguard_libraries import openvex_pipeline

_SCHEMA = (
    "ecosystem string, doc_pos long, statements array<struct<"
    "vulnerability struct<name string>, status string, timestamp string, "
    "products array<struct<id string, identifiers struct<purl string>>>>>"
)


def _p(purl=None, at_id=None):
    return (at_id, (purl,))


def _run(spark, rows, fixdates=None):
    df = spark.createDataFrame(rows, _SCHEMA)
    out = openvex_pipeline(df, fixdates)
    return {
        (r["ecosystem"], r["vuln_id"]): r.asDict(recursive=True)
        for r in out.collect()
    }


def test_product_filter_and_purl_fallback(spark):
    out = _run(
        spark,
        [
            ("python", 0, [
                (("CVE-1",), "fixed", "2025-01-02T03:04:05Z", [
                    # keeps: pypi purl with +cgr. fragment
                    _p(purl="pkg:pypi/flask@2.0.1+cgr.1"),
                    # keeps: @id fallback when identifiers.purl empty
                    _p(purl="", at_id="pkg:maven/org.x/lib@1.2.cgr.3"),
                    # drops: wrong fragment for type
                    _p(purl="pkg:pypi/django@4.0.cgr.1"),
                    # drops: unsupported type
                    _p(purl="pkg:npm/leftpad@1.0+cgr.1"),
                    # drops: no version
                    _p(purl="pkg:pypi/flask"),
                    # drops: no purl at all
                    _p(),
                ]),
            ]),
        ],
    )
    rec = out[("python", "CVE-1")]
    kept = [
        (p["identifiers"]["purl"], p["id"]) for p in rec["document"]["products"]
    ]
    assert kept == [
        ("pkg:pypi/flask@2.0.1+cgr.1", None),
        ("", "pkg:maven/org.x/lib@1.2.cgr.3"),
    ]
    # both fixes fall back to the advisory timestamp candidate
    assert rec["fixes"] == [
        {"product": "pkg:pypi/flask@2.0.1+cgr.1",
         "available": {"date": "2025-01-02", "kind": "advisory"}},
        {"product": "pkg:maven/org.x/lib@1.2.cgr.3",
         "available": {"date": "2025-01-02", "kind": "advisory"}},
    ]
    assert rec["link"] == "https://images.chainguard.dev/security/CVE-1"


def test_nameless_drop_last_wins_and_status_contract(spark):
    out = _run(
        spark,
        [
            ("python", 0, [
                # nameless -> dropped
                ((None,), "fixed", "2025-01-01T00:00:00Z",
                 [_p(purl="pkg:pypi/a@1+cgr.1")]),
                # first CVE-2 statement: would keep product a
                (("CVE-2",), "fixed", "2025-01-01T00:00:00Z",
                 [_p(purl="pkg:pypi/a@1+cgr.1")]),
                # LAST CVE-2 statement wins (different product set)
                (("CVE-2",), "Fixed", "2025-02-01T00:00:00Z",
                 [_p(purl="pkg:pypi/b@2+cgr.1")]),
                # non-fixed status: reference raises; pipeline drops
                (("CVE-3",), "under_investigation", "2025-01-01T00:00:00Z",
                 [_p(purl="pkg:pypi/c@3+cgr.1")]),
                # missing status is fine
                (("CVE-4",), None, None, [_p(purl="pkg:pypi/d@4+cgr.1")]),
            ]),
        ],
    )
    assert set(out) == {("python", "CVE-2"), ("python", "CVE-4")}
    rec2 = out[("python", "CVE-2")]
    assert rec2["document"]["timestamp"] == "2025-02-01T00:00:00Z"
    assert [f["product"] for f in rec2["fixes"]] == ["pkg:pypi/b@2+cgr.1"]
    # no timestamp and no store -> no fixes, empty array (not null)
    assert out[("python", "CVE-4")]["fixes"] == []


def test_store_hit_beats_advisory_candidate(spark):
    import datetime

    fixdates = spark.createDataFrame(
        [("CVE-5", "flask", "2.0.1+cgr.1", "pypi",
          datetime.date(2024, 12, 1), "first-observed", True)],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date date, kind string, accurate boolean",
    )
    out = _run(
        spark,
        [
            ("python", 0, [
                (("CVE-5",), "fixed", "2025-01-15T00:00:00Z", [
                    _p(purl="pkg:pypi/flask@2.0.1+cgr.1"),
                    _p(purl="pkg:pypi/jinja2@3.1+cgr.2"),
                ]),
            ]),
        ],
        fixdates=fixdates,
    )
    fixes = out[("python", "CVE-5")]["fixes"]
    # flask: the accurate store hit is EARLIER-dated and accurate — wins;
    # jinja2: no store row -> advisory candidate
    assert fixes == [
        {"product": "pkg:pypi/flask@2.0.1+cgr.1",
         "available": {"date": "2024-12-01", "kind": "first-observed"}},
        {"product": "pkg:pypi/jinja2@3.1+cgr.2",
         "available": {"date": "2025-01-15", "kind": "advisory"}},
    ]


def test_same_vuln_across_ecosystem_docs_stays_separate(spark):
    out = _run(
        spark,
        [
            ("python", 0, [
                (("CVE-6",), "fixed", "2025-01-01T00:00:00Z",
                 [_p(purl="pkg:pypi/a@1+cgr.1")]),
            ]),
            ("java", 1, [
                (("CVE-6",), "fixed", "2025-01-01T00:00:00Z",
                 [_p(purl="pkg:maven/g/a@1.cgr.1")]),
            ]),
        ],
    )
    assert set(out) == {("python", "CVE-6"), ("java", "CVE-6")}


def test_plan_shape_no_cartesian_store_broadcast(spark):
    """Scale pin: the fix-date store joins broadcast against the
    exploded product fact; nothing plans as a cartesian."""
    import datetime

    docs = spark.createDataFrame(
        [("py", 0, [(("CVE-1",), "fixed", "2025-01-01T00:00:00Z",
                     [_p(purl="pkg:pypi/a@1+cgr.1")])])],
        _SCHEMA,
    )
    fx = spark.createDataFrame(
        [("CVE-1", "a", "1+cgr.1", "pypi",
          datetime.date(2024, 1, 1), "k", True)],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date date, kind string, accurate boolean",
    )
    plan = (
        openvex_pipeline(docs, fx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_purl_packageurl_normalization(spark):
    """PackageURL.from_string (reference pin packageurl-python >= 0.16)
    lowercases the purl TYPE and normalizes pypi names (lowercase,
    '_' -> '-'), so a non-canonical 'pkg:PyPI/Foo_Bar@1.0+cgr.1' —
    plausible via the @id fallback — is KEPT and finder-matched as
    'foo-bar'; maven names keep their case (r11 ADVICE)."""
    import datetime

    fixdates = spark.createDataFrame(
        [
            ("CVE-8", "foo-bar", "1.0+cgr.1", "pypi",
             datetime.date(2024, 6, 1), "first-observed", True),
            ("CVE-8", "LibA", "1.cgr.1", "maven",
             datetime.date(2024, 6, 2), "first-observed", True),
        ],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date date, kind string, accurate boolean",
    )
    out = _run(
        spark,
        [
            ("python", 0, [
                (("CVE-8",), "fixed", "2025-01-15T00:00:00Z", [
                    _p(purl="pkg:PyPI/Foo_Bar@1.0+cgr.1"),
                    _p(purl="pkg:Maven/org.X/LibA@1.cgr.1"),
                ]),
            ]),
        ],
        fixdates=fixdates,
    )
    fixes = out[("python", "CVE-8")]["fixes"]
    # both store hits land (earlier-dated accurate rows beat advisory)
    assert fixes == [
        {"product": "pkg:PyPI/Foo_Bar@1.0+cgr.1",
         "available": {"date": "2024-06-01", "kind": "first-observed"}},
        {"product": "pkg:Maven/org.X/LibA@1.cgr.1",
         "available": {"date": "2024-06-02", "kind": "first-observed"}},
    ]


def test_filter_products_regex_equals_composed_form(spark):
    """The r15 one-regex-per-branch filter_products must keep EXACTLY
    the elements of the composed purl_field predicate it replaced
    (VERDICT r14 Next #7).  The fixture sweeps the qualifier/subpath
    edge cases the rework's equivalence argument rests on: '@' anchors
    that the version regex skips ('@?'/'@#'/trailing '@'), fragments
    hidden behind '?'/'#', fragments after a second '@' inside the
    version span, case variants of scheme/type, and the purl-less /
    empty-pid fallbacks."""
    from pyspark.sql import functions as F

    from vunnel_spark.pipelines.chainguard_libraries import (
        _filter_products_composed,
        filter_products,
    )

    pids = [
        "pkg:pypi/foo@1.0+cgr.1",            # plain keep
        "pkg:maven/g/a@2.0.cgr.3",           # maven keep
        "pkg:PyPI/Foo_Bar@1.0+cgr.1",        # case-insensitive type
        "PKG:pypi/foo@1.0+cgr.1",            # case-SENSITIVE scheme: drop
        "pkg:pypi/foo@1.0",                  # no fragment: drop
        "pkg:maven/g/a@1.0+cgr.1",           # wrong fragment for type: drop
        "pkg:pypi/foo@1.0.cgr.1",            # wrong fragment for type: drop
        "pkg:npm/foo@1.0+cgr.1",             # unlisted type: drop
        "pkg:pypi/foo",                      # no version: drop
        "pkg:pypi/foo@",                     # empty version: drop
        "pkg:pypi/foo@?x@1+cgr.0",           # first '@' invalid, second anchors: keep
        "pkg:pypi/a?b@1+cgr.0",              # '?' in name, version still found: keep
        "pkg:pypi/foo@1?y+cgr.0",            # fragment behind '?': drop
        "pkg:pypi/foo@1#y+cgr.0",            # fragment behind '#': drop
        "pkg:pypi/foo@1@2+cgr.0",            # fragment after 2nd '@' in span: keep
        "pkg:pypi/foo@1?x@2+cgr.0",          # span ends at '?', later '@' ignored: drop
        "pkg:pypi/foo@+cgr.1",               # fragment at span start: keep
        "pkg:py@pi/x@1+cgr.0",               # '@' inside type: drop
        "pkg://x@1+cgr.0",                   # empty type: drop
        "",                                  # empty pid -> fallback NULL
        None,                                # no purl, no id
    ]
    rows = [([(pid, (pid,)) for pid in pids],)]
    schema = (
        "products array<struct<id string, "
        "identifiers struct<purl string>>>"
    )
    df = spark.createDataFrame(rows, schema)
    got = df.select(
        F.transform(filter_products(F.col("products")), lambda p: p["id"])
        .alias("xs")
    ).collect()[0]["xs"]
    want = df.select(
        F.transform(
            _filter_products_composed(F.col("products")), lambda p: p["id"]
        ).alias("xs")
    ).collect()[0]["xs"]
    assert got == want
    # and the fixture actually exercises both keep branches
    assert "pkg:maven/g/a@2.0.cgr.3" in got and "pkg:pypi/foo@1.0+cgr.1" in got
