"""fedora_pipeline branch semantics (fedora/parser.py:209-370, 398-413).

Hand-built Bodhi update frames hit every branch: alias/release drops,
the severity map (incl. unknown and empty tiers), CVE extraction
precedence (security bugs first; display_name+title fallback with one
shared seen-set), NVR parsing (non-rpm and malformed skipped, null
epoch -> 0), the no-packages drop, per-CVE vs per-alias records, the
cross-update FixedIn merge (first alias establishes the record), and
the fixdate priority (finder hit beats the date_stable candidate).
"""

from __future__ import annotations

from vunnel_spark.pipelines.fedora import fedora_pipeline

_SCHEMA = (
    "alias string, release_version string, severity string, "
    "display_name string, title string, notes string, "
    "date_submitted string, date_modified string, date_stable string, "
    "url string, "
    "bugs array<struct<security boolean, title string>>, "
    "builds array<struct<type string, nvr string, epoch int>>"
)


def _frames(spark):
    updates = spark.createDataFrame(
        [
            # u1: happy path — security bug CVEs (non-security ignored),
            # two rpm builds (one null epoch), finder hit on pkga
            ("FEDORA-2025-aaa", "41", "urgent", "pkga security update",
             "t", "", "2025-01-01", "2025-01-05", "2025-01-04",
             "https://x/aaa",
             [(False, "unrelated CVE-1999-0001"),
              (True, "CVE-2025-1 and CVE-2025-2"),
              (True, "dup CVE-2025-1")],
             [("rpm", "pkga-1.2-3.fc41", None),
              ("container", "img-1-1", None),
              ("rpm", "badnvr", None),
              ("rpm", "pkgb-2.0-1.fc41", 2)]),
            # u2: SAME CVE-2025-1 in release 41, later alias — must only
            # extend FixedIn, never override u1's head fields
            ("FEDORA-2025-bbb", "41", "low", "pkgc update",
             "t", "", "2025-02-01", "", "2025-02-03", "https://x/bbb",
             [(True, "CVE-2025-1")],
             [("rpm", "pkgc-3.0-1.fc41", None)]),
            # u3: no security-bug CVEs -> display_name THEN title
            # fallback with a shared seen-set; empty severity -> Unknown;
            # url null -> default bodhi link; no date_stable
            ("FEDORA-2025-ccc", "42", "", "fix CVE-2025-7",
             "also CVE-2025-7 and CVE-2025-8", "", "", "", "", None,
             [(False, "CVE-2025-9 hidden (non-security)")],
             [("rpm", "pkgd-1.0-1.fc42", None)]),
            # u4: NO CVEs anywhere -> one record keyed by the alias
            ("FEDORA-2025-ddd", "42", "bogus-tier", "plain bugfix",
             "t", "", "", "", "", "https://x/ddd",
             [], [("rpm", "pkge-1.0-1.fc42", None)]),
            # u5: alias empty -> drops
            ("", "41", "low", "d", "t", "", "", "", "", None,
             [], [("rpm", "p-1-1", None)]),
            # u6: non-numeric release -> drops
            ("FEDORA-2025-eee", "rawhide", "low", "d", "t", "", "", "",
             "", None, [], [("rpm", "p-1-1", None)]),
            # u7: only non-rpm / malformed builds -> no packages -> drops
            ("FEDORA-2025-fff", "41", "low", "d CVE-2025-5", "t", "",
             "", "", "", None, [], [("container", "img-1-1", None),
                                    ("rpm", "nodash", None)]),
        ],
        _SCHEMA,
    )
    fixdates = spark.createDataFrame(
        [
            # finder hit for u1's first vuln id (CVE-2025-1) x pkga —
            # must BEAT the date_stable candidate
            ("CVE-2025-1", "pkga", "0:1.2-3.fc41", "fedora:41",
             "2024-12-30", "first-observed"),
        ],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date string, kind string",
    )
    return updates, fixdates


def test_fedora_pipeline_branches(spark):
    updates, fixdates = _frames(spark)
    out = {
        (r["NamespaceName"], r["Name"]): r.asDict(recursive=True)
        for r in fedora_pipeline(updates, fixdates=fixdates).collect()
    }
    assert set(out) == {
        ("fedora:41", "CVE-2025-1"),
        ("fedora:41", "CVE-2025-2"),
        ("fedora:42", "CVE-2025-7"),
        ("fedora:42", "CVE-2025-8"),
        ("fedora:42", "FEDORA-2025-ddd"),
    }

    c1 = out[("fedora:41", "CVE-2025-1")]
    # u1 (lower alias) establishes the record; u2 only extends FixedIn
    assert c1["Severity"] == "Critical"
    assert c1["Link"] == "https://x/aaa"
    assert c1["Issued"] == "2025-01-01"
    assert c1["Updated"] == "2025-01-05"  # date_modified wins over stable
    assert [f["Name"] for f in c1["FixedIn"]] == ["pkga", "pkgb", "pkgc"]
    fa, fb, fc = c1["FixedIn"]
    assert fa["Version"] == "0:1.2-3.fc41"       # null epoch -> 0
    assert fb["Version"] == "2:2.0-1.fc41"       # explicit epoch
    assert fa["VersionFormat"] == "rpm"
    assert fa["VendorAdvisory"]["AdvisorySummary"] == [
        {"ID": "FEDORA-2025-aaa", "Link": "https://x/aaa"}
    ]
    assert fc["VendorAdvisory"]["AdvisorySummary"][0]["ID"] == "FEDORA-2025-bbb"
    # finder hit beats u1's date_stable candidate...
    assert fa["Available"] == {"Date": "2024-12-30", "Kind": "first-observed"}
    # ...while pkgb (no finder row) falls back to date_stable
    assert fb["Available"] == {"Date": "2025-01-04", "Kind": "advisory"}
    assert c1["CVE"] == [{
        "Name": "CVE-2025-1",
        "Link": "https://nvd.nist.gov/vuln/detail/CVE-2025-1",
    }]

    # uniqueness kept CVE-2025-2 once; the non-security 1999 bug never leaks
    assert ("fedora:41", "CVE-1999-0001") not in out

    c7 = out[("fedora:42", "CVE-2025-7")]
    assert c7["Severity"] == "Unknown"  # empty tier
    assert c7["Link"] == "https://bodhi.fedoraproject.org/updates/FEDORA-2025-ccc"
    assert c7["FixedIn"][0]["Available"] is None  # no stable date, no finder
    # the shared seen-set: CVE-2025-7 (display_name) not re-added from
    # title; CVE-2025-8 picked up from title; non-security bug ignored
    assert ("fedora:42", "CVE-2025-8") in out
    assert ("fedora:42", "CVE-2025-9") not in out

    d = out[("fedora:42", "FEDORA-2025-ddd")]
    assert d["Severity"] == "Unknown"  # unmapped tier
    assert d["CVE"] == []              # alias-keyed record carries no CVE refs


def test_fedora_pipeline_without_finder(spark):
    updates, _ = _frames(spark)
    rows = fedora_pipeline(updates).collect()
    by = {(r["NamespaceName"], r["Name"]): r.asDict(recursive=True) for r in rows}
    fa = by[("fedora:41", "CVE-2025-1")]["FixedIn"][0]
    # without the finder the date_stable advisory candidate attaches
    assert fa["Available"] == {"Date": "2025-01-04", "Kind": "advisory"}


def test_advisory_candidate_beats_later_first_observed(spark):
    """fixdate.best ranks the accurate 'advisory' candidate FIRST and
    only discards it when an accurate first-observed store date is
    strictly EARLIER (finder.py:153-194: results = [advisory] +
    store, filtered by date <= first_observed) — so a store date
    AFTER date_stable loses, and an EQUAL date loses too (the <= on
    finder.py:187 keeps the advisory)."""
    updates = spark.createDataFrame(
        [
            ("FEDORA-2026-aaa", "41", "low", "d CVE-2026-1", "t",
             "", "", "", "2025-03-01", None,
             [], [("rpm", "pkga-1.0-1.fc41", None),
                  ("rpm", "pkgb-1.0-1.fc41", None)]),
        ],
        _SCHEMA,
    )
    fixdates = spark.createDataFrame(
        [
            # LATER than date_stable -> advisory wins
            ("CVE-2026-1", "pkga", "0:1.0-1.fc41", "fedora:41",
             "2025-06-01", "first-observed"),
            # EQUAL date -> advisory still wins (kind tie-break)
            ("CVE-2026-1", "pkgb", "0:1.0-1.fc41", "fedora:41",
             "2025-03-01", "first-observed"),
        ],
        "vuln_id string, package string, fix_version string, "
        "ecosystem string, date string, kind string",
    )
    out = {
        r["Name"]: r.asDict(recursive=True)
        for r in fedora_pipeline(updates, fixdates=fixdates).collect()
    }
    fa, fb = out["CVE-2026-1"]["FixedIn"]
    assert fa["Available"] == {"Date": "2025-03-01", "Kind": "advisory"}
    assert fb["Available"] == {"Date": "2025-03-01", "Kind": "advisory"}


def test_nvr_rsplit_keeps_empty_segments(spark):
    """rsplit('-', 2) only drops NVRs with fewer than two hyphens —
    'a--b' and 'a-b-' keep their empty version/release segments
    (fedora/parser.py:247-254), they are not malformed."""
    updates = spark.createDataFrame(
        [
            ("FEDORA-2026-bbb", "41", "low", "d CVE-2026-2", "t",
             "", "", "", "", None,
             [], [("rpm", "pkg--7", None),      # empty version
                  ("rpm", "pkg-2.0-", None),    # empty release
                  ("rpm", "nodash", None),      # < 2 hyphens -> drop
                  ("rpm", "one-dash", None)]),  # < 2 hyphens -> drop
        ],
        _SCHEMA,
    )
    out = {
        r["Name"]: r.asDict(recursive=True)
        for r in fedora_pipeline(updates).collect()
    }
    fis = out["CVE-2026-2"]["FixedIn"]
    assert [(f["Name"], f["Version"]) for f in fis] == [
        ("pkg", "0:-7"),
        ("pkg", "0:2.0-"),
    ]


def test_parse_builds_split_equals_regex_form(spark):
    """The r15 split/slice NVR parse must keep exactly the language and
    captures of the _NVR_RE form it replaced (greedy head: name = all
    but the last two segments).  Sweeps empty segments, multi-hyphen
    names, empty names, null nvr, and non-rpm types."""
    from pyspark.sql import functions as F

    from vunnel_spark.pipelines.fedora import _NVR_RE, parse_builds

    nvrs = [
        "pkga1-1.2-1.fc41", "lib-foo-bar-2.0-3", "a--", "--", "-a-b",
        "a-b-", "a--b", "nodash", "one-dash", "", None,
        "x-y-z-w",  # name keeps inner hyphens: x-y
    ]
    rows = [([("rpm", n, None) for n in nvrs] + [("container", "a-b-c", 4)],)]
    schema = "builds array<struct<type string, nvr string, epoch int>>"
    df = spark.createDataFrame(rows, schema)

    def regex_form(builds):
        rpm = F.filter(
            builds,
            lambda b: (b["type"] == "rpm")
            & F.coalesce(b["nvr"], F.lit("")).rlike(_NVR_RE),
        )
        return F.transform(
            rpm,
            lambda b: F.struct(
                F.regexp_extract(b["nvr"], _NVR_RE, 1).alias("name"),
                F.concat(
                    F.coalesce(b["epoch"], F.lit(0)).cast("string"),
                    F.lit(":"),
                    F.regexp_extract(b["nvr"], _NVR_RE, 2),
                    F.lit("-"),
                    F.regexp_extract(b["nvr"], _NVR_RE, 3),
                ).alias("version"),
            ),
        )

    got = df.select(parse_builds(F.col("builds")).alias("p")).collect()[0]["p"]
    want = df.select(regex_form(F.col("builds")).alias("p")).collect()[0]["p"]
    assert got == want
    assert len(got) >= 7  # the sweep actually kept the >=2-hyphen rpms
