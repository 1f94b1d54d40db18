"""arch_pipeline branch semantics (arch/parser.py:248-302, 168-226).

The reference strips every scalar it reads after a falsy-default .get —
these pins cover the branches where un-stripped comparisons diverge.
"""

from __future__ import annotations

from vunnel_spark.pipelines.arch import arch_pipeline

_SCHEMA = (
    "group_id string, status string, packages array<string>, "
    "fixed_version string, severity string, vuln_type string, "
    "issues array<string>, advisories array<string>"
)


def _run(spark, rows):
    recs = spark.createDataFrame(rows, _SCHEMA)
    asa = spark.createDataFrame(
        [("ASA-1", "2024-03-01"), ("ASA-2", "2024-02-01")],
        "asa_id string, date string",
    )
    return {
        r.record_id: r.asDict() for r in arch_pipeline(recs, asa).collect()
    }


def test_strip_semantics_and_null_status(spark):
    out = _run(
        spark,
        [
            # null status: .get default '' -> record KEPT
            ("AVG-1", None, ["pkga"], "1.0-1", " High ", " ", ["CVE-1"],
             ["ASA-1", "ASA-2"]),
            # padded 'Not affected' still skips
            ("AVG-2", "  Not affected  ", ["pkgb"], "1.0-1", "High", "t",
             [], []),
            # whitespace-only fixed version is UNFIXED: Version 'None',
            # no ASA lookup, no available date
            ("AVG-3", "Vulnerable", ["pkgc"], "   ", "Low", "overflow",
             [], ["ASA-1"]),
            # padded group id trims before keying/lowering
            ("  AVG-4  ", "Vulnerable", ["pkgd"], None, "bogus", "",
             [], []),
        ],
    )
    assert set(out) == {"avg-1", "avg-3", "avg-4"}
    a1 = out["avg-1"]
    assert a1["version"] == "1.0-1"
    assert a1["severity"] == "High"          # padded tier still maps
    # whitespace-only type falls back to the synthesized description
    assert a1["description"] == "Arch vulnerability AVG-1"
    assert a1["available_date"] == "2024-02-01"  # earliest ASA wins
    a3 = out["avg-3"]
    assert a3["version"] == "None"
    assert a3["available_date"] is None
    a4 = out["avg-4"]
    assert a4["severity"] == "Unknown"
    assert a4["link"] == "https://security.archlinux.org/AVG-4"
