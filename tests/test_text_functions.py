"""Golden tests for text functions: pkg-string heuristic + fingerprints."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_split_pkg_string_cases(spark):
    from vunnel_spark.functions.text import split_pkg_string

    # every branch of _get_name_version (rhel/parser.py:395-438)
    cases = [
        # epoch in the middle
        ("openssl-1:3.0.1-2", "openssl", "1:3.0.1-2"),
        # epoch at the beginning
        ("1:foo-bar-2.3.4-5.el6", "foo-bar", "1:2.3.4-5.el6"),
        # epoch at the beginning, dashless remainder -> rhsa fallback
        ("1:foo", "foo", None),
        # app stream: pre-colon tail not digits -> whole head is name
        ("foo-bar:rhel8-12345", "foo-bar", None),
        # no colon, >= 2 dashes: rsplit-2 with NO digit test
        ("kernel-rt-5.14.0-284", "kernel-rt", "5.14.0-284"),
        ("just-a-name", "just", "a-name"),
        # no colon, < 2 dashes: whole string is the name (parser.py:436)
        ("zlib-1.2.12", "zlib-1.2.12", None),
        ("bash", "bash", None),
        (None, None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "pkg string")
    out = df.withColumn("p", split_pkg_string(F.col("pkg"))).select(
        "pkg", "p.name", "p.version"
    )
    got = {r.pkg: (r.name, r.version) for r in out.collect()}
    for pkg, name, ver in cases:
        assert got[pkg] == (name, ver), f"{pkg}: {got[pkg]} != {(name, ver)}"


def test_fingerprint_golden_constants(spark):
    """Pin fingerprint values to golden md5 constants so any future
    formulation change that alters values fails locally before it can
    reach an external gate (the r4 regex-split and r5 codepoint-sum
    formulations each diverged between engine versions; md5-of-head
    cannot).  Constants computed with Python hashlib over UTF-8 bytes of
    the first 500 characters."""
    from vunnel_spark.functions.text import fingerprint

    cases = [
        ("hello world", "5eb63bbbe01eeed093cb22bb8f5acdc3"),
        ("", "d41d8cd98f00b204e9800998ecf8427e"),
        ("a" * 600, "be39ba69b8fe1601f6f24f85fa20ce6c"),  # md5 of 'a'*500
        ("naïve café — ünïcode",
         "078e7ec63cbf60c1e886ee5f37307717"),
        ("line1\nline2\tx0b\x0bv", "8d7f756f3eb6d489507df67a7546d21f"),
        (None, None),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)],
                               "i int, text string")
    got = {r.i: r.fp for r in
           df.select("i", fingerprint(F.col("text")).alias("fp")).collect()}
    for i, (text, want) in enumerate(cases):
        assert got[i] == want, f"case {i} ({text!r:.30}): {got[i]} != {want}"


def test_fingerprint_matches_duckdb(spark):
    """Cross-engine property check: Spark fingerprint == DuckDB
    md5(substr(text,1,500)) on mixed ASCII / non-ASCII / empty / long
    inputs — the exact comparison the external gate performs."""
    import duckdb

    texts = ["hello world", "", "a" * 600, "tab\tnewline\n", "ünïcode — ok",
             "x" * 499 + "é" + "tail beyond head"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from vunnel_spark.functions.text import fingerprint

    spark_fp = [r.fp for r in
                df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    con = duckdb.connect()
    duck_fp = [con.execute(
        "SELECT md5(substr(?, 1, 500))", [t]).fetchone()[0] for t in texts]
    assert spark_fp == duck_fp


def test_text_queries_survive_degenerate_documents(spark, tmp_path):
    """x16/x17 on a corpus with empty / 1-word / 4-word docs: Spark's
    sequence(1, n-1) DESCENDS when n==1 (producing an element_at(w, 0)
    error) — the round-6 review found the gate corpus' 10-word minimum
    was masking it.  The fixed queries must agree with their oracles on
    exactly this corpus."""
    import duckdb

    from tests._compare import assert_matches_oracle
    from vunnel_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = [
        (1, "", "en", "s", 0),
        (2, "one", "en", "s", 3),
        (3, "a b c d", "en", "s", 7),
        (4, "x " * 40, "en", "s", 80),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    ddb = duckdb.connect()
    ddb.execute(  # Spark writes a directory; DuckDB needs the file glob
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    for name in ("x16_gopher_repetition", "x17_bigram_perplexity"):
        spec = REGISTRY[name]
        assert_matches_oracle(spec.fn(spark, sf), ddb, spec.oracle)


def test_x24_chunks_tile_documents_with_overlap(spark, sf_dir):
    """Chunking invariants per doc: chunk 0 starts at token 1, every
    later chunk starts exactly stride tokens after the previous, every
    chunk except the last is full-size, the last chunk ends exactly at
    the document's final token, and the union of chunk spans covers
    every token index."""
    from pyspark.sql import functions as F

    from vunnel_spark.queries.text import _CHUNK_C, _CHUNK_S
    from vunnel_spark.registry import REGISTRY
    from vunnel_spark.session import load_table

    out = REGISTRY["x24_chunk_windows"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
        )
        .collect()
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(ntok)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = ntok[did]
        covered = set()
        for r in rows:
            start = 1 + r["chunk_idx"] * _CHUNK_S
            end = start + r["n_tokens"] - 1
            covered.update(range(start, end + 1))
            if r is not rows[-1]:
                assert r["n_tokens"] == _CHUNK_C, (did, r)
        last = rows[-1]
        assert 1 + last["chunk_idx"] * _CHUNK_S + last["n_tokens"] - 1 == n
        assert covered == set(range(1, n + 1)), did


def test_x22_buckets_partition_scored_docs(spark, sf_dir):
    """CCNet terciles: the three buckets partition the scored docs
    (counts sum to the scored-doc total), bucket value ranges are
    disjoint and ordered head < middle < tail, and head/middle are
    nonempty (the disc cut is a member, so at least the minimum lands
    in head)."""
    from pyspark.sql import functions as F

    from vunnel_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = {r["bucket"]: r for r in
           REGISTRY["x22_perplexity_buckets"].fn(spark, sf_dir).collect()}
    docs = REGISTRY["x17_bigram_perplexity"].fn(spark, sf_dir)
    n_scored = docs.count()
    assert sum(r["n_docs"] for r in out.values()) == n_scored
    assert out["head"]["n_docs"] > 0 and out["middle"]["n_docs"] > 0
    if "middle" in out and "head" in out:
        assert out["head"]["max_nll"] <= out["middle"]["min_nll"]
    if "tail" in out and "middle" in out:
        assert out["middle"]["max_nll"] <= out["tail"]["min_nll"]


def test_x21_boilerplate_fraction_bounds(spark, sf_dir):
    """Boilerplate accounting: n_boiler <= n_shingles for every doc,
    the fraction is exactly the integer ratio, and kept is the exact
    2x comparison."""
    from vunnel_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["x21_boilerplate_phrases"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_shingles"]
        assert r["boiler_frac"] == round(r["n_boiler"] / r["n_shingles"], 6)
        assert r["kept"] == (2 * r["n_boiler"] <= r["n_shingles"])


def test_cvss31_both_scopes_known_anchors(spark):
    """The shared Catalyst CVSS 3.1 scoring (functions/cvss.py, used by
    e14 and the GHSA envelope) against published FIRST calculator
    anchors, both scopes, including the Impact<=0 zero and the spec
    Roundup; sub-scores and severities pinned alongside."""
    from pyspark.sql import functions as F
    from vunnel_spark.functions.cvss import cvss3_scores

    # (base, esc, isc, severity) — esc/isc from the FIRST 3.1 formulas,
    # quantized to 0.1 like github/parser.py:613-615
    cases = {
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:C/C:H/I:H/A:H": (10.0, 3.9, 6.0, "Critical"),
        "CVSS:3.1/AV:N/AC:L/PR:L/UI:N/S:C/C:L/I:L/A:N": (6.4, 3.1, 2.7, "Medium"),
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H": (9.8, 3.9, 5.9, "Critical"),
        "CVSS:3.1/AV:L/AC:H/PR:H/UI:R/S:C/C:L/I:N/A:N": (2.3, 0.6, 1.4, "Low"),
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:N/A:N": (0.0, 3.9, 0.0, "None"),
        "CVSS:3.1/AV:P/AC:H/PR:H/UI:R/S:C/C:N/I:N/A:L": (1.8, 0.2, 1.4, "Low"),
    }
    df = spark.createDataFrame([(v,) for v in cases], "vector string")
    s = cvss3_scores(F.col("vector"))
    got = {
        r.vector: (r.base, r.esc, r.isc, r.sev)
        for r in df.select(
            "vector",
            s["base_score"].alias("base"),
            s["esc"].alias("esc"),
            s["isc"].alias("isc"),
            s["severity"].alias("sev"),
        ).collect()
    }
    for v, (base, esc, isc, sev) in cases.items():
        gb, ge, gi, gs = got[v]
        assert abs(gb - base) < 1e-9, (v, gb, base)
        assert abs(ge - esc) < 1e-9, (v, ge, esc)
        assert abs(gi - isc) < 1e-9, (v, gi, isc)
        assert gs == sev, (v, gs, sev)


def test_cvss_quantize_matches_decimal_half_even():
    """Exhaustive pin of the quantization claim in functions/cvss.py:
    plain round-half-up on the double esc/isc equals the reference's
    Decimal half-even quantize (github/parser.py:613-615) for EVERY
    reachable metric combination — no reachable value sits near a .05
    tie, so the rounding modes cannot disagree."""
    from decimal import Decimal as D
    from itertools import product

    AV = [D("0.85"), D("0.62"), D("0.55"), D("0.2")]
    AC = [D("0.77"), D("0.44")]
    PR_U = [D("0.85"), D("0.62"), D("0.27")]
    PR_C = [D("0.85"), D("0.68"), D("0.5")]
    UI = [D("0.85"), D("0.62")]
    CIA = [D("0.56"), D("0.22"), D("0")]

    def f_round1(x: float) -> float:
        # the engines' round(x, 1): half away from zero on the double
        import math
        return math.floor(abs(x) * 10 + 0.5) / 10 * (1 if x >= 0 else -1)

    # exploitability: 8.22 * AV * AC * PR * UI, both PR tables
    for av, ac, ui in product(AV, AC, UI):
        for pr in PR_U + PR_C:
            exact = D("8.22") * av * ac * pr * ui
            ref = float(exact.quantize(D("0.1")))  # half-even
            got = f_round1(float(av) * float(ac) * float(pr) * float(ui) * 8.22)
            assert got == ref, (av, ac, pr, ui, got, ref)

    # impact: both scopes over all 27 CIA combinations
    for c, i, a in product(CIA, repeat=3):
        iss_d = 1 - (1 - c) * (1 - i) * (1 - a)
        iss_f = 1 - (1 - float(c)) * (1 - float(i)) * (1 - float(a))
        # unchanged
        ref = float((D("6.42") * iss_d).quantize(D("0.1")))
        assert f_round1(6.42 * iss_f) == ref
        # changed (the ^15 expanded exactly like the Catalyst side)
        exact = D("7.52") * (iss_d - D("0.029")) - D("3.25") * (iss_d - D("0.02")) ** 15
        x1 = iss_f - 0.02
        x2 = x1 * x1
        x4 = x2 * x2
        x8 = x4 * x4
        approx = 7.52 * (iss_f - 0.029) - 3.25 * (((x8 * x4) * x2) * x1)
        assert f_round1(approx) == float(exact.quantize(D("0.1")))


def test_ghsa_cvss_envelope_branches(spark):
    """Branch pins for the GHSA CVSS-severities envelope
    (github/parser.py:604-687 via pipelines/github.py): trailing-slash
    strip, 3.0-vs-3.1 minor detection, legacy sub-scores + N/A status,
    v4 validate-only passthrough (version always 4.0, no score), and
    every malformed class dropping exactly the entries the reference's
    exception handlers drop."""
    from pyspark.sql import functions as F
    from vunnel_spark.pipelines.github import cvss_severities_envelope

    rows = [
        # (id, v3 vector, v4 vector)
        ("ok31", "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", None),
        ("ok30slash", "CVSS:3.0/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/", None),
        ("temporal", "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/E:F/RL:W", None),
        ("badprefix", "CVSS:2.0/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", None),
        ("missing", "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H", None),
        ("badval", "CVSS:3.1/AV:Q/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", None),
        ("dupkey", "CVSS:3.1/AV:N/AV:L/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H", None),
        ("unknownkey", "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/XX:N", None),
        ("v4ok", None,
         "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N"),
        ("v4slashu", None,
         "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N/U:Green/"),
        ("v4bad", None,
         "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N"),
        ("both", "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/",
         "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N"),
        ("none", None, None),
    ]
    df = spark.createDataFrame(
        rows, "id string, cvss_v3_vector string, cvss_v4_vector string"
    )
    out = {
        r.id: r
        for r in cvss_severities_envelope(df)
        .select(
            "id", "legacy_cvss", "cvss_v3", "cvss_v4",
            F.filter(
                F.array("cvss_v3", "cvss_v4"), lambda x: x.isNotNull()
            ).alias("entries"),
        )
        .collect()
    }
    ok = out["ok31"]
    assert ok.legacy_cvss.version == "3.1"
    assert ok.legacy_cvss.status == "N/A"
    assert ok.legacy_cvss.base_metrics.base_score == 9.8
    assert ok.legacy_cvss.base_metrics.exploitability_score == 3.9
    assert ok.legacy_cvss.base_metrics.impact_score == 5.9
    assert ok.legacy_cvss.base_metrics.base_severity == "Critical"
    assert ok.cvss_v3.version == "3.1"
    assert [e.version for e in ok.entries] == ["3.1"]

    slash = out["ok30slash"]
    assert slash.legacy_cvss.version == "3.0"
    # removesuffix: the stored vector loses exactly the one trailing /
    assert not slash.cvss_v3.vector.endswith("/")
    assert slash.cvss_v3.version == "3.0"

    # temporal metrics are valid vector content; base score unchanged
    assert out["temporal"].legacy_cvss.base_metrics.base_score == 9.8

    for bad in ("badprefix", "missing", "badval", "dupkey", "unknownkey"):
        assert out[bad].legacy_cvss is None, bad
        assert out[bad].cvss_v3 is None, bad

    v4 = out["v4ok"]
    assert v4.legacy_cvss is None and v4.cvss_v3 is None
    assert v4.cvss_v4.version == "4.0"
    # multi-letter U value + trailing slash both accepted
    u = out["v4slashu"].cvss_v4
    assert u.version == "4.0" and u.vector.endswith("/U:Green")
    assert out["v4bad"].cvss_v4 is None  # SA missing -> mandatory check

    both = out["both"]
    # append order v3 then v4 (parser.py:677/:685)
    assert [e.version for e in both.entries] == ["3.1", "4.0"]
    none = out["none"]
    assert none.legacy_cvss is None and none.entries == []


def test_layered_cvss_eval_equals_column_form(spark):
    """The r14 hot-path rework (functions/cvss.py with_cvss3_eval /
    with_cvss4_valid — layered named-column projections) must accept and
    score EXACTLY the language of the single-Column builders it
    replaced in the envelopes.  Fixture covers every malformed class
    (bad prefix, trailing slash, unknown key, bad value, multi-char
    value, 3-part segment, empty value, missing mandatory, duplicate
    key, NULL) plus valid 3.0/3.1/temporal and v4 word-valued vectors;
    compared via exceptAll both ways so a NULL-vs-False or score drift
    anywhere fails loudly."""
    from pyspark.sql import functions as F

    from vunnel_spark.functions.cvss import (
        cvss3_scores,
        cvss3_valid,
        cvss4_valid,
        with_cvss3_eval,
        with_cvss4_valid,
    )

    v3 = [
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.0/AV:P/AC:H/PR:H/UI:R/S:C/C:N/I:L/A:N/E:F/RL:W/RC:C",
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/",
        "CVSS:2.0/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H/ZZ:X",
        "CVSS:3.1/AV:Q/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.1/AV:NA/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.1/AV:N:X/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.1/AV:/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H",
        "CVSS:3.1/AV:N/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
        None,
    ]
    v4 = [
        "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H/SA:H",
        "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H/SA:H/U:Green",
        "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H/SA:H/U:Teal",
        "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:H/SI:H",
        None,
    ]
    df3 = spark.createDataFrame([(v,) for v in v3], "vec string")
    s = cvss3_scores(F.col("vec"))
    col3 = df3.select(
        "vec", cvss3_valid(F.col("vec")).alias("ok"),
        s["base_score"].alias("b"), s["esc"].alias("e"),
        s["isc"].alias("i"), s["severity"].alias("sv"))
    lay3 = with_cvss3_eval(df3, F.col("vec"), "_c3").select(
        "vec", F.col("_c3_ok").alias("ok"), F.col("_c3_base").alias("b"),
        F.col("_c3_esc").alias("e"), F.col("_c3_isc").alias("i"),
        F.col("_c3_sev").alias("sv"))
    assert col3.exceptAll(lay3).count() == 0
    assert lay3.exceptAll(col3).count() == 0

    df4 = spark.createDataFrame([(v,) for v in v4], "vec string")
    col4 = df4.select("vec", cvss4_valid(F.col("vec")).alias("ok"))
    lay4 = with_cvss4_valid(df4, F.col("vec"), "_c4").select(
        "vec", F.col("_c4_ok").alias("ok"))
    assert col4.exceptAll(lay4).count() == 0
    assert lay4.exceptAll(col4).count() == 0
