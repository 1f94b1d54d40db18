"""Static lints over every registered oracle's SQL text.

Three external-gate incidents in this project were oracle-portability
bugs, not logic bugs: Spark ``ascii()`` vs DuckDB ``unicode()`` on
non-ASCII (x4, round 4), struct-typed ``list_aggregate('max')``
(x4, round 5), and the per-row double->DECIMAL cast whose
truncate-vs-round behavior differs across DuckDB versions (b1, round
6 — rows/schema green, hash red, while every local engine agreed).
The classes that already bit twice get a lint here so the fourth
incident fails at commit time with a pointer to the postmortem, not
at an external gate three weeks later.

Known-but-unlinted hazard (round 8, llm1): ``round(avg(<double>), n)``
over GROUPS is accumulation-order-sensitive — Spark's partial-sum merge
order varies run to run, and a ~1e-16 wobble occasionally crosses the
rounding boundary (llm1 flipped hash one run in ~three at sf0.1 before
its fix).  When the averaged column is itself already rounded to n
decimals, sum exact integer micro-units instead and divide once
(queries/llm_q.py avg_quality).  Not linted because long-stable queries
(tpch q1's canonical avgs) use the raw form with 7 rounds of green
evidence — prefer the micro-units form in NEW queries.
"""

from __future__ import annotations

import re

from vunnel_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

# CAST(<bare column> AS DECIMAL(p, s>0)): a raw DOUBLE cast to a scaled
# decimal per row.  ~5% of the fixture's cent-valued doubles sit an
# epsilon BELOW their exact cent (3,341/60,000 sf0.01 l_extendedprice),
# so an engine build that truncates the double->decimal conversion
# instead of rounding it loses a cent on each — sums shift, the value
# hash goes red, and nothing reproduces locally.  Portable money math
# is exact-integer cents — CAST(floor(x * 100 + 0.5) AS BIGINT) — or
# round(sum(x), 2) AFTER aggregating; see the b1 postmortem in
# vunnel_spark/queries/layout_q.py's module docstring.
# DECIMAL(38,0) over integer inputs (x6/c1 hash arithmetic) is exact on
# every engine and deliberately NOT matched (scale-0 group below).
_DECIMAL_CAST_OF_COLUMN = re.compile(
    r"CAST\s*\(\s*[A-Za-z_][\w.]*\s+AS\s+DECIMAL\s*\(\s*\d+\s*,\s*[1-9]",
    re.IGNORECASE,
)


def test_no_decimal_cast_of_raw_double():
    offenders = {
        name: _DECIMAL_CAST_OF_COLUMN.search(spec.oracle).group(0)
        for name, spec in REGISTRY.items()
        if spec.oracle and _DECIMAL_CAST_OF_COLUMN.search(spec.oracle)
    }
    assert not offenders, (
        "oracle casts a bare column to a scaled DECIMAL — the b1 round-6 "
        "gate-red class (truncating vs rounding double->decimal conversion "
        "differs across DuckDB versions).  Use exact-integer cents "
        "CAST(floor(x*100+0.5) AS BIGINT) on BOTH sides (non-negative "
        "amounts only — sign-aware floor(abs(x)*100+0.5)*sign(x) for "
        "signed money), or round(sum(x), n) after aggregation.  "
        f"Offenders: {offenders}"
    )


# Waivers for deliberate full-codepoint ascii()/unicode() use, keyed by
# query name.  A waiver asserts the oracle call is NOT the x4 round-4
# hazard (Spark ascii() <-> DuckDB unicode() divergence on non-ASCII when
# the Spark side assumed single-byte input) because the Spark side itself
# computes the full codepoint.  The value documents why, for the reviewer.
_CODEPOINT_WAIVERS = {
    "x5_language_id": (
        "the oracle's unicode() mirrors the Python UDF's ord() in the "
        "CJK codepoint-range rule (19968-40959, queries/text.py); both "
        "sides are deliberately full-codepoint, so there is no "
        "single-byte assumption to violate"
    ),
    "llm1_pretrain_corpus_dag": (
        "embeds x5's detector SQL verbatim (queries/llm_q.py) — same "
        "deliberate full-codepoint CJK rule as the x5 waiver above"
    ),
}


def test_no_ascii_unicode_codepoint_mismatch():
    """Spark ``ascii()`` and older DuckDB ``ascii()`` disagree on
    non-ASCII input (DuckDB's historical behavior matched ``unicode()``);
    the portable spelling pair is Spark ascii <-> DuckDB unicode ONLY for
    guaranteed-single-byte input.  Any oracle line calling
    ascii()/unicode() must carry a same-line ``-- single-byte``
    justification naming that guarantee, or the query must hold an entry
    in ``_CODEPOINT_WAIVERS`` explaining why full-codepoint behavior is
    intended on BOTH engines.  Same-line + structured-waiver (rather than
    a substring match over the whole oracle) so a marker in one branch
    cannot silently waive a later unrelated call."""
    pat = re.compile(r"\b(ascii|unicode)\s*\(", re.IGNORECASE)
    offenders = {}
    for name, spec in REGISTRY.items():
        if not spec.oracle or name in _CODEPOINT_WAIVERS:
            continue
        for line in spec.oracle.splitlines():
            if pat.search(line) and "single-byte" not in line:
                offenders[name] = line.strip()
                break
    assert not offenders, (
        "oracle line uses ascii()/unicode() without a same-line "
        "'-- single-byte' justification or a _CODEPOINT_WAIVERS entry "
        f"(the x4 round-4 incident class): {offenders}"
    )


def test_codepoint_waivers_are_live():
    """A waiver for a query that no longer exists or no longer calls
    ascii()/unicode() is stale — fail so it gets removed."""
    pat = re.compile(r"\b(ascii|unicode)\s*\(", re.IGNORECASE)
    for name in _CODEPOINT_WAIVERS:
        spec = REGISTRY.get(name)
        assert spec is not None and spec.oracle and pat.search(spec.oracle), (
            f"stale codepoint waiver: {name}"
        )
