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
        "CAST(floor(x*100+0.5) AS BIGINT) on BOTH sides, or round(sum(x), n) "
        f"after aggregation.  Offenders: {offenders}"
    )


def test_no_ascii_unicode_codepoint_mismatch():
    """Spark ``ascii()`` and older DuckDB ``ascii()`` disagree on
    non-ASCII input (DuckDB's historical behavior matched ``unicode()``);
    the portable spelling pair is Spark ascii <-> DuckDB unicode ONLY for
    guaranteed-single-byte input.  Any oracle using ascii()/unicode() must
    carry a justification comment naming the single-byte guarantee."""
    pat = re.compile(r"\b(ascii|unicode)\s*\(", re.IGNORECASE)
    offenders = {
        name: pat.search(spec.oracle).group(0)
        for name, spec in REGISTRY.items()
        if spec.oracle
        and pat.search(spec.oracle)
        and "single-byte" not in spec.oracle
    }
    assert not offenders, (
        "oracle uses ascii()/unicode() without a '-- single-byte' "
        f"justification (the x4 round-4 incident class): {offenders}"
    )
