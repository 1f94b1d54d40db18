"""Golden tests for text functions: pkg-string heuristic + fingerprints."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_split_pkg_string_cases(spark):
    from vunnel_spark.functions.text import split_pkg_string

    cases = [
        ("openssl-1:3.0.1-2", "openssl", "1:3.0.1-2"),
        ("kernel-rt-5.14.0-284", "kernel-rt", "5.14.0-284"),
        ("zlib-1.2.12", "zlib", "1.2.12"),
        ("just-a-name", "just-a-name", None),
        (None, None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "pkg string")
    out = df.withColumn("p", split_pkg_string(F.col("pkg"))).select(
        "pkg", "p.name", "p.version"
    )
    got = {r.pkg: (r.name, r.version) for r in out.collect()}
    for pkg, name, ver in cases:
        assert got[pkg] == (name, ver), f"{pkg}: {got[pkg]} != {(name, ver)}"
