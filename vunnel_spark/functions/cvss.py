"""CVSS vector validation + scoring as pure Catalyst expressions.

Models the reference's GHSA CVSS-severities envelope
(/root/reference/src/vunnel/providers/github/parser.py:604-687), which
delegates vector parsing/validation to the public ``cvss`` library
(RedHatProductSecurity/cvss) and the score math to the public FIRST
CVSS 3.1 specification.  Everything here is re-derived from those two
public sources; nothing is ported from the reference's code.

Reference behaviors reproduced (parser.py line anchors):

* ``_make_legacy_cvss`` (:604-628) — one trailing ``/`` stripped
  (``str.removesuffix``), vector parsed as CVSS3; on success a legacy
  CVSS object with ``version = "3.<minor>"`` (:610), the stripped
  vector string, quantized base/exploitability/impact sub-scores
  (``Decimal.quantize(Decimal("0.1"))`` — ROUND_HALF_EVEN, :613-615),
  ``base_severity = severities()[0]`` (:616) and ``status = "N/A"``;
  on any parse error the legacy object is None.
* ``_make_cvss_v3`` (:630-646) — ``{"version": "3.<minor>",
  "vector": <stripped>}`` or None on parse error.
* ``_make_cvss_v4`` (:648-665) — vector VALIDATED as CVSS 4.0 (the
  library parse), version extracted from ``clean_vector()``'s prefix
  (always ``"4.0"`` for a vector the parse accepted), NO score math.

Quantization fidelity: the reference rounds esc/isc half-even via
Decimal; this module uses plain ``F.round(x, 1)`` (half-up) on doubles.
A sweep of the complete reachable value set (96 exploitability / 54
impact products of the spec's 2-dp coefficients) shows the nearest
value to a .05 tie is 2.2e-4 away while double-vs-Decimal drift is
~1.3e-15, so half-up on doubles is everywhere equal to the reference's
half-even on Decimals (pinned by
tests/test_text_functions.py::test_cvss_quantize_matches_decimal_half_even).

Validation fidelity: the ``cvss`` library accepts base + temporal +
environmental metrics in any order, rejects unknown keys, invalid
values, duplicate keys, and missing mandatory metrics.  All of that is
expressed below with split + higher-order array functions (JVM-side,
no UDF).  The CVSS 4.0 spec additionally RECOMMENDS canonical metric
order; this module does not enforce order (matching the library's v3
behavior), and every fixture emits canonical order so the difference
is unobservable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# metric vocabularies (public FIRST specs, Table 15 / Table 23)
# ---------------------------------------------------------------------------

#: CVSS 3.x metric -> allowed single-letter values (base+temporal+env).
CVSS3_METRICS: dict[str, str] = {
    "AV": "NALP", "AC": "LH", "PR": "NLH", "UI": "NR", "S": "UC",
    "C": "HLN", "I": "HLN", "A": "HLN",
    "E": "XHFPU", "RL": "XUWTO", "RC": "XCRU",
    "CR": "XHML", "IR": "XHML", "AR": "XHML",
    "MAV": "XNALP", "MAC": "XLH", "MPR": "XNLH", "MUI": "XNR",
    "MS": "XUC", "MC": "XHLN", "MI": "XHLN", "MA": "XHLN",
}
CVSS3_MANDATORY = ("AV", "AC", "PR", "UI", "S", "C", "I", "A")

#: CVSS 4.0 metric -> allowed values (some multi-character: U's words).
CVSS4_METRICS: dict[str, tuple[str, ...]] = {
    "AV": ("N", "A", "L", "P"), "AC": ("L", "H"), "AT": ("N", "P"),
    "PR": ("N", "L", "H"), "UI": ("N", "P", "A"),
    "VC": ("H", "L", "N"), "VI": ("H", "L", "N"), "VA": ("H", "L", "N"),
    "SC": ("H", "L", "N"), "SI": ("H", "L", "N"), "SA": ("H", "L", "N"),
    "E": ("X", "A", "P", "U"),
    "CR": ("X", "H", "M", "L"), "IR": ("X", "H", "M", "L"),
    "AR": ("X", "H", "M", "L"),
    "MAV": ("X", "N", "A", "L", "P"), "MAC": ("X", "L", "H"),
    "MAT": ("X", "N", "P"), "MPR": ("X", "N", "L", "H"),
    "MUI": ("X", "N", "P", "A"),
    "MVC": ("X", "H", "L", "N"), "MVI": ("X", "H", "L", "N"),
    "MVA": ("X", "H", "L", "N"), "MSC": ("X", "H", "L", "N"),
    "MSI": ("X", "S", "H", "L", "N"), "MSA": ("X", "S", "H", "L", "N"),
    "S": ("X", "N", "P"), "AU": ("X", "N", "Y"),
    "R": ("X", "A", "U", "I"), "V": ("X", "D", "C"),
    "RE": ("X", "L", "M", "H"),
    "U": ("X", "Clear", "Green", "Amber", "Red"),
}
CVSS4_MANDATORY = (
    "AV", "AC", "AT", "PR", "UI", "VC", "VI", "VA", "SC", "SI", "SA",
)


def _alternation(metrics: dict) -> str:
    """'^(AV:[NALP]|AC:[LH]|...)$' segment-grammar regex."""
    alts = []
    for key, vals in metrics.items():
        if isinstance(vals, str):
            alts.append(f"{key}:[{vals}]")
        else:
            alts.append(f"{key}:({'|'.join(vals)})")
    return "^(" + "|".join(alts) + ")$"


CVSS3_SEGMENT_RE = _alternation(CVSS3_METRICS)
CVSS4_SEGMENT_RE = _alternation(CVSS4_METRICS)


def strip_trailing_slash(vec: Column) -> Column:
    """``str.removesuffix("/")`` — exactly one trailing slash removed
    (parser.py:606/:632/:650)."""
    return F.regexp_replace(vec, "/$", "")


def _segments_valid(vec: Column, prefixes: tuple[str, ...],
                    segment_re: str, mandatory: tuple[str, ...]) -> Column:
    """Shared grammar: prefix, per-segment key:value vocabulary, no
    duplicate keys, all mandatory metrics present.  ``vec`` must already
    be trailing-slash-stripped.  NULL vec -> NULL (callers gate)."""
    parts = F.split(vec, "/")
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    keys = F.transform(rest, lambda p: F.split(p, ":").getItem(0))
    return (
        F.element_at(parts, 1).isin(list(prefixes))
        & (F.size(rest) >= len(mandatory))
        & F.forall(rest, lambda p: p.rlike(segment_re))
        & (F.size(rest) == F.size(F.array_distinct(keys)))
        & F.forall(
            F.array(*[F.lit(m) for m in mandatory]),
            lambda m: F.array_contains(keys, m),
        )
    )


def cvss3_valid(stripped: Column) -> Column:
    """True when the CVSS3 constructor would accept the vector."""
    return _segments_valid(
        stripped, ("CVSS:3.0", "CVSS:3.1"), CVSS3_SEGMENT_RE, CVSS3_MANDATORY
    )


def cvss4_valid(stripped: Column) -> Column:
    """True when the CVSS4 constructor would accept the vector."""
    return _segments_valid(
        stripped, ("CVSS:4.0",), CVSS4_SEGMENT_RE, CVSS4_MANDATORY
    )


def cvss3_version(stripped: Column) -> Column:
    """``f"3.{minor_version}"`` (parser.py:610/:635) — the minor comes
    from the vector's own prefix."""
    return F.concat(F.lit("3."), F.regexp_extract(stripped, r"^CVSS:3\.([01])/", 1))


# ---------------------------------------------------------------------------
# CVSS 3.x base-score math (FIRST 3.1 spec §7.1 + Appendix A)
# ---------------------------------------------------------------------------

_AV = {"N": 0.85, "A": 0.62, "L": 0.55, "P": 0.2}
_AC = {"L": 0.77, "H": 0.44}
_UI = {"N": 0.85, "R": 0.62}
_CIA = {"H": 0.56, "L": 0.22, "N": 0.0}


def _metric(vec: Column, field: str, mapping: dict) -> Column:
    c = F.regexp_extract(vec, rf"/{field}:([A-Z])", 1)
    chain = None
    for k, v in mapping.items():
        chain = F.when(c == k, v) if chain is None else chain.when(c == k, v)
    return chain.otherwise(F.lit(None))


def cvss3_scores(vec: Column) -> dict[str, Column]:
    """Base/exploitability/impact sub-scores + severity for a VALID
    CVSS 3.x vector (caller gates on :func:`cvss3_valid`).

    Returns column dict: ``base_score`` (spec Roundup — round-to-nearest
    at 1e-5 then snap/ceil to the tenth, Appendix A), ``esc``/``isc``
    (quantized to 0.1 like parser.py:613-615), ``severity``
    (severities()[0] thresholds on the rounded base score).  The
    (ISS-0.02)^15 power is expanded to explicit IEEE multiplications in
    the association ``(((x8*x4)*x2)*x1)`` so DuckDB oracles can compute
    bit-identical doubles.
    """
    chg = F.regexp_extract(vec, r"/S:([A-Z])", 1) == "C"
    av = _metric(vec, "AV", _AV)
    ac = _metric(vec, "AC", _AC)
    pr_raw = F.regexp_extract(vec, r"/PR:([A-Z])", 1)
    # scope-dependent PR (spec Table 8 footnote)
    pr = (
        F.when(pr_raw == "N", F.lit(0.85))
        .when(pr_raw == "L", F.when(chg, F.lit(0.68)).otherwise(F.lit(0.62)))
        .otherwise(F.when(chg, F.lit(0.5)).otherwise(F.lit(0.27)))
    )
    ui = _metric(vec, "UI", _UI)
    iss = (
        1
        - (1 - _metric(vec, "C", _CIA))
        * (1 - _metric(vec, "I", _CIA))
        * (1 - _metric(vec, "A", _CIA))
    )
    x1 = iss - F.lit(0.02)
    x2 = x1 * x1
    x4 = x2 * x2
    x8 = x4 * x4
    impact = F.when(
        chg, F.lit(7.52) * (iss - F.lit(0.029)) - F.lit(3.25) * (((x8 * x4) * x2) * x1)
    ).otherwise(F.lit(6.42) * iss)
    expl = F.lit(8.22) * av * ac * pr * ui
    combined = F.least(
        F.when(chg, F.lit(1.08) * (impact + expl)).otherwise(impact + expl),
        F.lit(10.0),
    )
    # spec Roundup (3.1 Appendix A): ROUND-to-nearest at 1e-5 precision
    # (the spec pseudocode's round(input * 100000) — floor here snaps
    # values an ulp below a boundary down a tenth, ADVICE r12), then
    # exact-boundary passthrough, else the next tenth up.
    i5 = F.round(combined * F.lit(100000)).cast("long")
    roundup = F.when(i5 % 10000 == 0, i5 / F.lit(100000.0)).otherwise(
        (F.floor(i5 / 10000) + 1) / F.lit(10.0)
    )
    base = F.when(impact <= 0, F.lit(0.0)).otherwise(roundup)
    # qualitative severity (spec Table 14) on the ROUNDED score; the
    # thresholds 0/4/7/9 are exactly representable doubles so the
    # comparisons are engine-stable.
    severity = (
        F.when(base == 0.0, "None")
        .when(base < 4.0, "Low")
        .when(base < 7.0, "Medium")
        .when(base < 9.0, "High")
        .otherwise("Critical")
    )
    return {
        "base_score": base,
        # parser.py:614-615 quantize esc/isc to one decimal; half-up on
        # doubles == the reference's half-even on Decimals for every
        # reachable value (module docstring).
        "esc": F.round(expl, 1),
        "isc": F.round(impact, 1),
        "severity": severity,
    }
