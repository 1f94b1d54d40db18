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
