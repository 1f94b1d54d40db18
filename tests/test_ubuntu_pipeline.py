"""Golden test for the Ubuntu frozen-fragment pipeline (SURVEY §7.2
phases 10-11): per-ecosystem partition overwrite with frozen EOL'd
fragments, Pro-to-base wont-fix inference at yield time, and inference
layering on top of frozen base fragments after EOL.
"""

from __future__ import annotations

from vunnel_spark.pipelines import ubuntu_pipeline

SCHEMA = (
    "ecosystem string, cve_id string, pkg string, status string, "
    "fixed_version string"
)


def test_frozen_fragments_and_pro_inference(spark, tmp_path):
    wd = str(tmp_path / "ws")
    run1 = spark.createDataFrame(
        [
            ("ubuntu:22.04", "CVE-1", "openssl", "fixed", "3.0.1"),
            ("ubuntu:pro:22.04", "CVE-1", "openssl", "fixed", "3.0.1+esm1"),
            # Pro-only fix: base omits the entry -> must be inferred wont-fix
            ("ubuntu:pro:22.04", "CVE-2", "zlib", "fixed", "1.2.12+esm1"),
            ("ubuntu:20.04", "CVE-3", "bash", "fixed", "5.0-1"),
        ],
        SCHEMA,
    )
    out1 = ubuntu_pipeline(spark, run1, wd)
    rows1 = {(r.ecosystem, r.cve_id, r.pkg): r for r in out1.collect()}
    inf = rows1[("ubuntu:22.04", "CVE-2", "zlib")]
    assert inf.status == "wont_fix_inferred" and inf.origin == "inferred"
    # a (cve, pkg) base DOES cover is not inferred
    assert rows1[("ubuntu:22.04", "CVE-1", "openssl")].origin == "real"

    # run 2: 20.04 EOL'd (absent from today's tarball -> frozen), Pro ships
    # a new CVE -> new inference layers on top of the frozen 22.04 base
    run2 = spark.createDataFrame(
        [
            ("ubuntu:22.04", "CVE-1", "openssl", "fixed", "3.0.2"),
            ("ubuntu:pro:22.04", "CVE-4", "curl", "fixed", "7.81+esm2"),
        ],
        SCHEMA,
    )
    out2 = ubuntu_pipeline(spark, run2, wd)
    rows2 = {(r.ecosystem, r.cve_id, r.pkg): r for r in out2.collect()}
    # frozen ecosystem still emitted with its old content
    assert rows2[("ubuntu:20.04", "CVE-3", "bash")].fixed_version == "5.0-1"
    # rewritten partition carries the new content wholesale (CVE-2 pro row
    # was replaced away, so its inference is gone too — inference always
    # reflects CURRENT Pro data)
    assert rows2[("ubuntu:22.04", "CVE-1", "openssl")].fixed_version == "3.0.2"
    assert ("ubuntu:22.04", "CVE-2", "zlib") not in rows2
    assert rows2[("ubuntu:22.04", "CVE-4", "curl")].status == "wont_fix_inferred"


def test_yield_time_fix_dates_reach_frozen_fragments(spark, tmp_path):
    wd, state = str(tmp_path / "ws"), str(tmp_path / "fixdates")
    run1 = spark.createDataFrame(
        [("ubuntu:22.04", "CVE-1", "openssl", "fixed", "3.0.1")], SCHEMA
    )
    out1 = ubuntu_pipeline(spark, run1, wd, state_path=state, today_date="2026-08-13")
    assert {str(r.first_observed) for r in out1.collect()} == {"2026-08-13"}

    # second run rewrites nothing relevant (different ecosystem), but the
    # frozen fragment is still yielded WITH its stable fix date
    run2 = spark.createDataFrame(
        [("ubuntu:24.04", "CVE-9", "nginx", "fixed", "1.24-1")], SCHEMA
    )
    out2 = ubuntu_pipeline(spark, run2, wd, state_path=state, today_date="2027-01-01")
    dates = {
        (r.ecosystem, r.cve_id): str(r.first_observed) for r in out2.collect()
    }
    assert dates[("ubuntu:22.04", "CVE-1")] == "2026-08-13"  # did not move
    assert dates[("ubuntu:24.04", "CVE-9")] == "2027-01-01"


# ------------------------------------------------------------- OSV→OS
# downconvert (reference os_downconvert.py) — hand-built OSV envelopes
# covering every rule in the mapping table.

OSV_SCHEMA = (
    "record_id string, withdrawn string, upstream array<string>, "
    "severity array<struct<type:string,score:string>>, "
    "affected array<struct<"
    "package:struct<ecosystem:string,name:string>,"
    "ranges:array<struct<events:array<struct<fixed:string>>,"
    "fixes:array<struct<version:string,date:string,kind:string>>>>,"
    "status:string>>"
)


def _env(rid, eco, pkg="openssl", fixed=None, fixes=None, status=None,
         upstream=("CVE-2024-1000",), severity=(("Ubuntu", "high"),),
         withdrawn=None, affected=None):
    if affected is None:
        events = [(v,) for v in (fixed or [])]
        affected = [((eco, pkg), [(events, fixes or [])], status)]
    return (rid, withdrawn, list(upstream) or None,
            [tuple(s) for s in severity], affected)


def test_osv_to_os_downconvert_rules(spark):
    from vunnel_spark.pipelines.ubuntu import osv_to_os

    rows = [
        # base fixed + fix-date lookup hit
        _env("r1", "Ubuntu:22.04:LTS", fixed=["3.0.1-2"],
             fixes=[("3.0.1-2", "2024-01-02", "advisory")]),
        # base wont-fix (no fixed events, status=wont-fix)
        _env("r2", "Ubuntu:24.04", status="wont-fix", severity=(("Ubuntu", "negligible"),)),
        # base no-fix-yet (no wont-fix marker)
        _env("r3", "Ubuntu:22.04:LTS", severity=(("Ubuntu", "untriaged"),)),
        # plain Pro with a real fix -> +esm channel
        _env("r4", "Ubuntu:Pro:14.04:LTS", fixed=["1.0+esm1"]),
        # plain Pro with NO fix -> no record at all
        _env("r5", "Ubuntu:Pro:14.04:LTS", status="wont-fix"),
        # FIPS tier never maps
        _env("r6", "Ubuntu:Pro:FIPS:22.04:LTS", fixed=["9.9"]),
        # Nvidia-BlueField never maps
        _env("r7", "Ubuntu:Nvidia-BlueField:22.04", fixed=["9.9"]),
        # withdrawn -> dropped
        _env("r8", "Ubuntu:22.04:LTS", fixed=["1.1"], withdrawn="2024-05-05"),
        # no upstream CVE -> dropped
        _env("r9", "Ubuntu:22.04:LTS", fixed=["1.1"], upstream=()),
        # pkg name missing on a base channel -> record with empty FixedIn
        _env("r10", "Ubuntu:22.04:LTS", pkg=None, upstream=("CVE-2024-1010",)),
        # two fixed events -> two FixedIn rows; date known for one only
        _env("r11", "Ubuntu:22.04:LTS", fixed=["2.0", "2.1"],
             fixes=[("2.1", "2024-03-04", "usn")], upstream=("CVE-2024-1011",)),
        # no Ubuntu-typed severity entry -> Unknown
        _env("r12", "Ubuntu:22.04:LTS", fixed=["5.0"], severity=(("CVSS_V3", "9.8"),),
             upstream=("CVE-2024-1012",)),
    ]
    osv = spark.createDataFrame(rows, OSV_SCHEMA)
    out = {(r.identifier, r.version): r for r in osv_to_os(osv).collect()}

    r1 = out[("ubuntu:22.04/cve-2024-1000", "3.0.1-2")]
    assert (r1.severity, r1.no_advisory, r1.available_date, r1.available_kind,
            r1.version_format) == ("High", False, "2024-01-02", "advisory", "dpkg")
    assert r1.link == "https://ubuntu.com/security/CVE-2024-1000"

    r2 = out[("ubuntu:24.04/cve-2024-1000", "None")]
    assert (r2.severity, r2.no_advisory) == ("Negligible", True)

    r3 = out[("ubuntu:22.04/cve-2024-1000", "None")]
    assert (r3.severity, r3.no_advisory) == ("Unknown", False)

    r4 = out[("ubuntu:14.04+esm/cve-2024-1000", "1.0+esm1")]
    assert r4.namespace == "ubuntu:14.04+esm" and r4.no_advisory is False

    # r5/r6/r7/r8/r9 produce nothing
    all_ids = {r.identifier for r in osv_to_os(osv).collect()}
    assert "ubuntu:22.04/cve-2024-1000" in all_ids
    assert not any("fips" in i.lower() for i in all_ids)
    got_namespaces = {r.namespace for r in osv_to_os(osv).collect()}
    assert got_namespaces == {"ubuntu:22.04", "ubuntu:24.04", "ubuntu:14.04+esm"}

    # r10: empty-FixedIn base record survives as a single null-FixedIn row
    r10 = out[("ubuntu:22.04/cve-2024-1010", None)]
    assert r10.fixed_name is None and r10.version_format is None

    # r11: one FixedIn per fixed event; date resolved per version
    r11a = out[("ubuntu:22.04/cve-2024-1011", "2.0")]
    r11b = out[("ubuntu:22.04/cve-2024-1011", "2.1")]
    assert r11a.available_date is None
    assert (r11b.available_date, r11b.available_kind) == ("2024-03-04", "usn")

    r12 = out[("ubuntu:22.04/cve-2024-1012", "5.0")]
    assert r12.severity == "Unknown"


def test_osv_to_os_include_esm_flag(spark):
    from vunnel_spark.pipelines.ubuntu import osv_to_os

    rows = [_env("r1", "Ubuntu:Pro:22.04:LTS", fixed=["1.0+esm1"])]
    osv = spark.createDataFrame(rows, OSV_SCHEMA)
    assert osv_to_os(osv, include_esm=True).count() == 1
    # include_esm off: plain Pro maps to None like the sub-tiers
    assert osv_to_os(osv, include_esm=False).count() == 0


def test_osv_to_os_plan_is_shuffle_free(spark):
    """The downconvert is per-record array work: the physical plan must
    contain no Exchange and no Python evaluation node."""
    from vunnel_spark.pipelines.ubuntu import osv_to_os

    osv = spark.createDataFrame([_env("r1", "Ubuntu:22.04:LTS", fixed=["1"])],
                                OSV_SCHEMA)
    plan = osv_to_os(osv)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
