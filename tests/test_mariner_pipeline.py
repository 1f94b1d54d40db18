"""mariner_pipeline branch semantics (mariner/parser.py:125-236).

Hand-built element frames hit every drop branch the reference's
imperative ref-chase takes: dangling test/object/state ids, null evr
values, unknown operations, empty first-object names, patchable and
severity gates, the last-less-than fixed version, and the descending
range sort.
"""

from __future__ import annotations

from vunnel_spark.pipelines.mariner import mariner_pipeline


def _frames(spark):
    definitions = spark.createDataFrame(
        [
            # d1: full happy path — two tests, mixed ops
            ("d1", "CVE-1", "http://x/1", "High", "true", "desc1", "2025-01-02",
             ["t1", "t2"]),
            # d2: severity null -> drops
            ("d2", "CVE-2", None, None, "true", None, None, ["t1"]),
            # d3: patchable 'Not Applicable' -> drops
            ("d3", "CVE-3", None, "Low", "Not Applicable", None, None, ["t1"]),
            # d4: no ref id -> drops
            ("d4", None, None, "Low", None, None, None, ["t1"]),
            # d4b: EMPTY-STRING ref id -> drops too (parser.py:219-221 is a
            # truthiness check, not a None check — ADVICE r10)
            ("d4b", "", None, "Low", None, None, None, ["t1"]),
            # d5: only unknown-op / null-evr states -> empty range -> drops
            ("d5", "CVE-5", None, "Low", None, None, "2025-03-04", ["t3", "t4"]),
            # d6: first object name empty -> drops (even though t2's is not)
            ("d6", "CVE-6", None, "Low", None, None, None, ["t5", "t2"]),
            # d7: dangling test ref + no-less-than range -> unfixed, no date
            ("d7", "CVE-7", None, "Bogus", "", "d", "2025-05-06",
             ["t-missing", "t6"]),
            # d8: fixed but no advisory date -> no availability
            ("d8", "CVE-8", None, "Low", None, None, None, ["t1"]),
            # d9: object ref dangles but state resolves -> no objects -> drops
            ("d9", "CVE-9", None, "Low", None, None, None, ["t7"]),
        ],
        "def_id string, ref_id string, ref_url string, severity string, "
        "patchable string, description string, advisory_date string, "
        "criteria array<string>",
    )
    tests = spark.createDataFrame(
        [
            ("t1", "o1", "s1"),        # < 2.0-1
            ("t2", "o2", "s2"),        # > 1.0-1
            ("t3", "o1", "s3"),        # unknown op
            ("t4", "o1", "s4"),        # null evr
            ("t5", "o3", "s1"),        # empty-name object
            ("t6", "o2", "s5"),        # <= 3.0-1 (no less-than)
            ("t7", "o-missing", "s1"),
        ],
        "test_id string, object_ref string, state_ref string",
    )
    objects = spark.createDataFrame(
        [("o1", "pkga"), ("o2", "pkgb"), ("o3", "")],
        "object_id string, name string",
    )
    states = spark.createDataFrame(
        [
            ("s1", "2.0-1", "less than"),
            ("s2", "1.0-1", "greater than"),
            ("s3", "9.9-9", "exists"),
            ("s4", None, "less than"),
            ("s5", "3.0-1", "less than or equal"),
        ],
        "state_id string, evr_value string, evr_operation string",
    )
    return definitions, tests, objects, states


def test_mariner_pipeline_branches(spark):
    out = {
        r["record_id"]: r.asDict()
        for r in mariner_pipeline(*_frames(spark)).collect()
    }
    # survivors: d1, d7, d8 only
    assert set(out) == {"CVE-1", "CVE-7", "CVE-8"}

    d1 = out["CVE-1"]
    assert d1["name"] == "pkga"                       # objects[0], not t2's
    assert d1["version"] == "2.0-1"                   # the less-than state
    assert d1["vulnerable_range"] == "> 1.0-1, < 2.0-1"  # sorted DESC
    assert d1["namespace"] == "mariner:2.0"
    assert d1["version_format"] == "rpm"
    assert d1["severity"] == "High"                   # raw passthrough
    assert d1["link"] == "http://x/1"
    assert d1["available_date"] == "2025-01-02"
    assert d1["available_kind"] == "advisory"

    d7 = out["CVE-7"]
    assert d7["name"] == "pkgb"          # dangling t-missing skipped silently
    assert d7["version"] == "None"       # <= only: no fixed version
    assert d7["vulnerable_range"] == "<= 3.0-1"
    assert d7["severity"] == "Bogus"     # no tier normalization here
    assert d7["available_date"] is None  # unfixed: date never attaches
    assert d7["available_kind"] is None
    assert d7["link"] == ""              # null url coalesces

    d8 = out["CVE-8"]
    assert d8["version"] == "2.0-1"
    assert d8["available_date"] is None  # fixed but no advisory date
    assert d8["available_kind"] is None


def test_mariner_last_less_than_wins(spark):
    definitions = spark.createDataFrame(
        [("d", "CVE-X", None, "Low", None, None, None, ["ta", "tb"])],
        "def_id string, ref_id string, ref_url string, severity string, "
        "patchable string, description string, advisory_date string, "
        "criteria array<string>",
    )
    tests = spark.createDataFrame(
        [("ta", "o1", "sa"), ("tb", "o1", "sb")],
        "test_id string, object_ref string, state_ref string",
    )
    objects = spark.createDataFrame([("o1", "p")], "object_id string, name string")
    states = spark.createDataFrame(
        [("sa", "1.0-1", "less than"), ("sb", "0.5-1", "less than")],
        "state_id string, evr_value string, evr_operation string",
    )
    row = mariner_pipeline(definitions, tests, objects, states).collect()[0]
    # the LAST less-than by criterion order sets the version, even when
    # it is the lexicographically smaller one (parser.py:142-146)
    assert row["version"] == "0.5-1"
    assert row["vulnerable_range"] == "< 1.0-1, < 0.5-1"


def test_empty_evr_value_contributes_nothing(spark):
    """'if state.evr and state.evr.value' (mariner/parser.py:140) is a
    falsy test: an empty-string evr produces no range entry and never
    sets the fixed version; a definition whose only states carry empty
    evrs drops whole (no entries)."""
    from vunnel_spark.pipelines.mariner import mariner_pipeline

    defs = spark.createDataFrame(
        [
            ("d1", "CVE-1", "u1", "High", None, "desc", "2024-01-01",
             ["t1", "t2"]),
            # only empty-evr states -> drops whole
            ("d2", "CVE-2", "u2", "High", None, "desc", None, ["t2"]),
        ],
        "def_id string, ref_id string, ref_url string, severity string, "
        "patchable string, description string, advisory_date string, "
        "criteria array<string>",
    )
    tests = spark.createDataFrame(
        [("t1", "o1", "s1"), ("t2", "o1", "s2")],
        "test_id string, object_ref string, state_ref string",
    )
    objects = spark.createDataFrame(
        [("o1", "openssl")], "object_id string, name string"
    )
    states = spark.createDataFrame(
        [("s1", "3.0.1", "less than"), ("s2", "", "less than")],
        "state_id string, evr_value string, evr_operation string",
    )
    out = {
        r.record_id: r.asDict()
        for r in mariner_pipeline(defs, tests, objects, states).collect()
    }
    assert set(out) == {"CVE-1"}
    assert out["CVE-1"]["version"] == "3.0.1"
    assert out["CVE-1"]["vulnerable_range"] == "< 3.0.1"
