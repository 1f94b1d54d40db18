"""Golden tests for the OSV fix-date patch pipeline: nested structure is
rebuilt faithfully (order, untouched fields, empty arrays) and the patch
only appears where the reference would write it (osv.py:104-108).
"""

from __future__ import annotations

import datetime

import pytest


@pytest.fixture(scope="module")
def patched(spark):
    from vunnel_spark.pipelines.osv import osv_patch_fix_dates

    adv_rows = [
        # two affected, ordering must survive; second range has no fixed
        {
            "id": "OSV-1",
            "published": datetime.datetime(2026, 1, 10),
            "affected": [
                {
                    "package": {"name": "zlib", "ecosystem": "apk"},
                    "ranges": [
                        {
                            "type": "ECOSYSTEM",
                            "events": [
                                {"introduced": "0", "fixed": None},
                                {"introduced": None, "fixed": "1.2.3"},
                            ],
                        },
                        {
                            "type": "GIT",
                            "events": [{"introduced": "0", "fixed": None}],
                        },
                    ],
                },
                {
                    "package": {"name": "openssl", "ecosystem": "apk"},
                    "ranges": [
                        {
                            "type": "ECOSYSTEM",
                            "events": [{"introduced": None, "fixed": "3.0.1"}],
                        }
                    ],
                },
            ],
        },
        # no affected at all: pure passthrough
        {"id": "OSV-2", "published": datetime.datetime(2026, 2, 1), "affected": []},
        # no published AND no store hit: no candidates -> no patch
        {
            "id": "OSV-3",
            "published": None,
            "affected": [
                {
                    "package": {"name": "curl", "ecosystem": "apk"},
                    "ranges": [
                        {
                            "type": "ECOSYSTEM",
                            "events": [{"introduced": None, "fixed": "8.0.0"}],
                        }
                    ],
                }
            ],
        },
    ]
    schema = (
        "id string, published timestamp, affected array<struct<"
        "package: struct<name: string, ecosystem: string>, "
        "ranges: array<struct<type: string, "
        "events: array<struct<introduced: string, fixed: string>>>>>>"
    )
    advisories = spark.createDataFrame(adv_rows, schema)
    fixdates = spark.createDataFrame(
        [("OSV-1", "zlib", "apk", "1.2.3", datetime.date(2025, 12, 1), "observed", True)],
        "vuln_id string, package string, ecosystem string, fix_version string, "
        "date date, kind string, accurate boolean",
    )
    out = osv_patch_fix_dates(advisories, fixdates)
    return {r["id"]: r.asDict(recursive=True) for r in out.collect()}


def test_accurate_store_hit_beats_published(patched):
    rng = patched["OSV-1"]["affected"][0]["ranges"][0]
    assert rng["database_specific"]["anchore"]["fixes"] == [
        {"version": "1.2.3", "date": "2025-12-01", "kind": "observed"}
    ]


def test_published_fallback_when_no_store_hit(patched):
    rng = patched["OSV-1"]["affected"][1]["ranges"][0]
    assert rng["database_specific"]["anchore"]["fixes"] == [
        {"version": "3.0.1", "date": "2026-01-10", "kind": "advisory"}
    ]


def test_range_without_fixed_events_left_unpatched(patched):
    rng = patched["OSV-1"]["affected"][0]["ranges"][1]
    assert rng["type"] == "GIT"
    assert rng["database_specific"] is None


def test_structure_and_order_preserved(patched):
    aff = patched["OSV-1"]["affected"]
    assert [a["package"]["name"] for a in aff] == ["zlib", "openssl"]
    r0 = aff[0]["ranges"]
    assert [r["type"] for r in r0] == ["ECOSYSTEM", "GIT"]
    # original events untouched (the patch adds a sibling field only)
    assert r0[0]["events"] == [
        {"introduced": "0", "fixed": None},
        {"introduced": None, "fixed": "1.2.3"},
    ]


def test_empty_affected_passthrough(patched):
    assert patched["OSV-2"]["affected"] == []


def test_no_candidates_no_patch(patched):
    rng = patched["OSV-3"]["affected"][0]["ranges"][0]
    assert rng["database_specific"] is None


def test_patched_records_validate_against_osv_schema(patched):
    """F9: the patched advisories re-assemble into documents that satisfy
    the OSV schema contract (reference schema/vulnerability/osv/
    schema-1.6.1.json == the published OSV 1.6 spec)."""
    import pytest as _pytest

    from vunnel_spark.sinks.schemas import (
        OSV_SCHEMA,
        SCHEMA_URL_OSV,
        validate_envelope_docs,
    )

    def clean(o):
        # None-valued optional keys don't appear in emitted OSV JSON
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items() if v is not None}
        if isinstance(o, list):
            return [clean(v) for v in o]
        return o

    docs = []
    for vid, row in patched.items():
        item = {
            "id": vid,
            "modified": (row["published"] or __import__("datetime").datetime(2026, 1, 1)).isoformat() + "Z",
            "affected": clean(row["affected"]),
        }
        docs.append({"schema": SCHEMA_URL_OSV, "identifier": vid, "item": item})
    assert validate_envelope_docs(docs, OSV_SCHEMA) == 3

    jsonschema = _pytest.importorskip("jsonschema")
    no_id = {"schema": SCHEMA_URL_OSV, "identifier": "x",
             "item": {"modified": "2026-01-01T00:00:00Z"}}
    with _pytest.raises(jsonschema.ValidationError):
        validate_envelope_docs([no_id], OSV_SCHEMA)


def test_rocky_normalize_ecosystem(spark):
    """providers/rocky/parser.py:69-74: 'Rocky Linux:<v>' (any case,
    exactly one colon) -> 'rocky:<v>'; everything else lowercases."""
    from pyspark.sql import functions as F

    from vunnel_spark.pipelines.osv import rocky_normalize_ecosystem

    rows = spark.createDataFrame(
        [("Rocky Linux:8",), ("rocky linux:9.2",), ("Rocky Linux:8:extra",),
         ("Rocky Linux",), ("AlmaLinux:8",), ("PyPI",)],
        "eco string",
    )
    got = [
        r["out"]
        for r in rows.select(
            rocky_normalize_ecosystem(F.col("eco")).alias("out")
        ).collect()
    ]
    assert got == [
        "rocky:8", "rocky:9.2", "rocky linux:8:extra",
        "rocky linux", "almalinux:8", "pypi",
    ]


def test_ecosystem_processor_rewrites_lookup_only(spark):
    """The rocky hook: the store keys by 'rocky:8' while the advisory
    says 'Rocky Linux:8' — the processed key must hit, and the emitted
    record must still carry the ORIGINAL ecosystem (utils/osv.py:47-48
    rewrites a local variable, never the document)."""
    import datetime

    from vunnel_spark.pipelines.osv import (
        osv_patch_fix_dates,
        rocky_normalize_ecosystem,
    )

    schema = (
        "id string, published timestamp, affected array<struct<"
        "package: struct<name: string, ecosystem: string>, "
        "ranges: array<struct<type: string, "
        "events: array<struct<introduced: string, fixed: string>>>>>>"
    )
    advisories = spark.createDataFrame(
        [{
            "id": "RLSA-2025:1",
            "published": datetime.datetime(2026, 1, 1),
            "affected": [{
                "package": {"name": "kernel", "ecosystem": "Rocky Linux:8"},
                "ranges": [{
                    "type": "ECOSYSTEM",
                    "events": [{"introduced": None, "fixed": "5.14-1"}],
                }],
            }],
        }],
        schema,
    )
    fixdates = spark.createDataFrame(
        [("RLSA-2025:1", "kernel", "rocky:8", "5.14-1",
          datetime.date(2025, 11, 1), "observed", True)],
        "vuln_id string, package string, ecosystem string, fix_version string, "
        "date date, kind string, accurate boolean",
    )
    out = {
        r["id"]: r.asDict(recursive=True)
        for r in osv_patch_fix_dates(
            advisories, fixdates, ecosystem_processor=rocky_normalize_ecosystem
        ).collect()
    }
    aff = out["RLSA-2025:1"]["affected"][0]
    assert aff["package"]["ecosystem"] == "Rocky Linux:8"  # untouched
    assert aff["ranges"][0]["database_specific"]["anchore"]["fixes"] == [
        {"version": "5.14-1", "date": "2025-11-01", "kind": "observed"}
    ]


def test_falsy_package_or_ecosystem_skips_even_fallback(spark):
    """utils/osv.py:39-46 continues BEFORE the range loop on a falsy
    package name or ecosystem: no store lookup AND no published-date
    fallback — the range passes through unpatched."""
    import datetime

    from vunnel_spark.pipelines.osv import osv_patch_fix_dates

    schema = (
        "id string, published timestamp, affected array<struct<"
        "package: struct<name: string, ecosystem: string>, "
        "ranges: array<struct<type: string, "
        "events: array<struct<introduced: string, fixed: string>>>>>>"
    )
    rng = [{"type": "ECOSYSTEM",
            "events": [{"introduced": None, "fixed": "1.0"}]}]
    advisories = spark.createDataFrame(
        [
            {"id": "OSV-E1", "published": datetime.datetime(2026, 1, 1),
             "affected": [{"package": {"name": "", "ecosystem": "apk"},
                           "ranges": rng}]},
            {"id": "OSV-E2", "published": datetime.datetime(2026, 1, 1),
             "affected": [{"package": {"name": "curl", "ecosystem": None},
                           "ranges": rng}]},
            {"id": "OSV-E3", "published": datetime.datetime(2026, 1, 1),
             "affected": [{"package": {"name": "curl", "ecosystem": "apk"},
                           "ranges": rng}]},
        ],
        schema,
    )
    fixdates = spark.createDataFrame(
        [],
        "vuln_id string, package string, ecosystem string, fix_version string, "
        "date date, kind string, accurate boolean",
    )
    out = {
        r["id"]: r.asDict(recursive=True)
        for r in osv_patch_fix_dates(advisories, fixdates).collect()
    }
    assert out["OSV-E1"]["affected"][0]["ranges"][0]["database_specific"] is None
    assert out["OSV-E2"]["affected"][0]["ranges"][0]["database_specific"] is None
    # control: a well-formed entry still gets the published fallback
    assert out["OSV-E3"]["affected"][0]["ranges"][0]["database_specific"][
        "anchore"
    ]["fixes"] == [{"version": "1.0", "date": "2026-01-01", "kind": "advisory"}]


def test_finder_best_cap_semantics(spark):
    """finder.best (tool/fixdate/finder.py:137-203): the accurate
    first-observed store date is a CAP and last resort, not a
    competitor — the published candidate wins whenever it is <= the
    store date (the common case: advisories publish before scanners
    first observe), the store wins only when every candidate is dated
    after it, an INACCURATE store row trails every candidate, and a
    store row is the pick of last resort when published is null."""
    import datetime

    from vunnel_spark.pipelines.osv import osv_patch_fix_dates

    schema = (
        "id string, published timestamp, affected array<struct<"
        "package: struct<name: string, ecosystem: string>, "
        "ranges: array<struct<type: string, "
        "events: array<struct<introduced: string, fixed: string>>>>>>"
    )

    def adv(vid, published, pkg, ver):
        return {
            "id": vid,
            "published": published,
            "affected": [
                {
                    "package": {"name": pkg, "ecosystem": "apk"},
                    "ranges": [
                        {"type": "ECOSYSTEM",
                         "events": [{"introduced": None, "fixed": ver}]}
                    ],
                }
            ],
        }

    jan10 = datetime.datetime(2026, 1, 10)
    advisories = spark.createDataFrame(
        [
            # store AFTER published -> published wins ('advisory')
            adv("OSV-A", jan10, "a", "1"),
            # store date == published -> published wins (<= on :187)
            adv("OSV-B", jan10, "b", "1"),
            # INACCURATE store, earlier than published -> published
            adv("OSV-C", jan10, "c", "1"),
            # null published, store only -> store
            adv("OSV-D", None, "d", "1"),
            # null published, INACCURATE store only -> store (last resort)
            adv("OSV-E", None, "e", "1"),
        ],
        schema,
    )
    fixdates = spark.createDataFrame(
        [
            ("OSV-A", "a", "apk", "1", datetime.date(2026, 3, 1), "observed", True),
            ("OSV-B", "b", "apk", "1", datetime.date(2026, 1, 10), "observed", True),
            ("OSV-C", "c", "apk", "1", datetime.date(2025, 1, 1), "observed", False),
            ("OSV-D", "d", "apk", "1", datetime.date(2026, 2, 2), "observed", True),
            ("OSV-E", "e", "apk", "1", datetime.date(2026, 2, 3), "observed", False),
        ],
        "vuln_id string, package string, ecosystem string, fix_version string, "
        "date date, kind string, accurate boolean",
    )
    out = {
        r["id"]: r.asDict(recursive=True)
        for r in osv_patch_fix_dates(advisories, fixdates).collect()
    }

    def fix(vid):
        return out[vid]["affected"][0]["ranges"][0]["database_specific"][
            "anchore"
        ]["fixes"][0]

    assert fix("OSV-A") == {"version": "1", "date": "2026-01-10", "kind": "advisory"}
    assert fix("OSV-B") == {"version": "1", "date": "2026-01-10", "kind": "advisory"}
    assert fix("OSV-C") == {"version": "1", "date": "2026-01-10", "kind": "advisory"}
    assert fix("OSV-D") == {"version": "1", "date": "2026-02-02", "kind": "observed"}
    assert fix("OSV-E") == {"version": "1", "date": "2026-02-03", "kind": "observed"}


def test_store_dim_uniqueness_contract(spark):
    """VERDICT r12 What's-wrong #4 pin: the cap's `min` over accurate
    store dates equals the reference's first-result semantics ONLY
    under one-row-per-(vuln_id, package, ecosystem, fix_version) — the
    structural guarantee of the reference store
    (vunnel_first_observed.py:35-63 returns <=1 row per key).
    validate_store_dim=True enforces it at execution time; a duplicate
    key must fail loudly instead of silently picking the earliest."""
    import datetime

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from vunnel_spark.pipelines.osv import osv_patch_fix_dates

    schema = (
        "id string, published timestamp, affected array<struct<"
        "package: struct<name: string, ecosystem: string>, "
        "ranges: array<struct<type: string, "
        "events: array<struct<introduced: string, fixed: string>>>>>>"
    )
    advisories = spark.createDataFrame(
        [
            {
                "id": "OSV-1",
                "published": datetime.datetime(2026, 1, 10),
                "affected": [
                    {
                        "package": {"name": "zlib", "ecosystem": "apk"},
                        "ranges": [
                            {
                                "type": "ECOSYSTEM",
                                "events": [{"introduced": None, "fixed": "1.2.3"}],
                            }
                        ],
                    }
                ],
            }
        ],
        schema,
    )
    dim_schema = (
        "vuln_id string, package string, ecosystem string, fix_version string, "
        "date date, kind string, accurate boolean"
    )
    unique_dim = spark.createDataFrame(
        [("OSV-1", "zlib", "apk", "1.2.3", datetime.date(2025, 12, 1),
          "observed", True)],
        dim_schema,
    )
    out = osv_patch_fix_dates(advisories, unique_dim, validate_store_dim=True)
    rng = out.collect()[0].asDict(recursive=True)["affected"][0]["ranges"][0]
    assert rng["database_specific"]["anchore"]["fixes"][0]["date"] == "2025-12-01"

    dup_dim = spark.createDataFrame(
        [
            ("OSV-1", "zlib", "apk", "1.2.3", datetime.date(2025, 12, 1),
             "observed", True),
            ("OSV-1", "zlib", "apk", "1.2.3", datetime.date(2025, 11, 1),
             "observed", True),
        ],
        dim_schema,
    )
    bad = osv_patch_fix_dates(advisories, dup_dim, validate_store_dim=True)
    with pytest.raises(SparkRuntimeException, match="duplicate key"):
        bad.collect()
