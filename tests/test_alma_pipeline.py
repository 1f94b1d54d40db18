"""alma_pipeline branch semantics (alma/parser.py:68-166).

Hand-built OSV frames hit every branch: the modularity token grammar
(happy path, no second space, no colon, edge colons, extra spaces),
the stamp reaching every affected entry, the library-gap clones (first
base entry wins, existing lib skips, absent base no-ops, non-gap ids
untouched, clones inherit the modularity stamp), and the key/schema
normalization.
"""

from __future__ import annotations

from vunnel_spark.pipelines.alma import alma_pipeline

_SCHEMA = (
    "version string, id string, schema_version string, summary string, "
    "affected array<struct<"
    "package struct<name string, ecosystem string>, "
    "ecosystem_specific struct<rpm_modularity string>>>"
)


def _aff(*names):
    return [((n, "AlmaLinux:8"), None) for n in names]


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return {r["id"]: r.asDict(recursive=True) for r in alma_pipeline(df).collect()}


def test_modularity_grammar(spark):
    out = _run(
        spark,
        [
            ("8", "A-1", None, "Moderate: mariadb:10.3 security update", _aff("mariadb")),
            ("8", "A-2", None, "Important: nodejs:16 security update", _aff("nodejs")),
            # no second space -> None
            ("8", "A-3", None, "Moderate: mariadb:10.3", _aff("mariadb")),
            # token has no colon -> None
            ("8", "A-4", None, "Moderate: mariadb security update", _aff("mariadb")),
            # colon at end / at start -> None
            ("8", "A-5", None, "Moderate: mariadb: security update", _aff("mariadb")),
            ("8", "A-6", None, "Moderate: :10.3 security update", _aff("mariadb")),
            # consecutive spaces: token between 1st and 2nd space is ''
            ("8", "A-7", None, "Moderate:  mariadb:10.3 update", _aff("mariadb")),
            ("8", "A-8", None, None, _aff("mariadb")),
        ],
    )
    mods = {
        k: v["affected"][0]["ecosystem_specific"] for k, v in out.items()
    }
    assert mods["A-1"] == {"rpm_modularity": "mariadb:10.3"}
    assert mods["A-2"] == {"rpm_modularity": "nodejs:16"}
    for k in ("A-3", "A-4", "A-5", "A-6", "A-7", "A-8"):
        assert mods[k] is None, k


def test_modularity_stamps_every_entry(spark):
    out = _run(
        spark,
        [("9", "A-9", None, "Low: php:7.4 security update", _aff("php", "php-cli"))],
    )
    assert [
        a["ecosystem_specific"]["rpm_modularity"] for a in out["A-9"]["affected"]
    ] == ["php:7.4", "php:7.4"]


def test_library_gap_clones(spark):
    out = _run(
        spark,
        [
            # gap id, base present -> clone appended at the end
            ("8", "ALSA-2019:3706", None, "s", _aff("lua", "other")),
            # gap id, library already listed -> untouched
            ("8", "ALSA-2020:5487", None, "s", _aff("pacemaker", "pacemaker-libs")),
            # gap id, base absent -> untouched
            ("8", "ALSA-2021:4386", None, "s", _aff("binutils")),
            # non-gap id with a gap-looking base -> untouched
            ("8", "ALSA-9999:0001", None, "s", _aff("lua")),
            # duplicate base entries -> exactly ONE clone (of the first)
            ("8", "ALSA-2021:4393", None, "s", _aff("cups", "cups")),
        ],
    )
    assert [a["package"]["name"] for a in out["ALSA-2019:3706"]["affected"]] == [
        "lua", "other", "lua-libs",
    ]
    assert [a["package"]["name"] for a in out["ALSA-2020:5487"]["affected"]] == [
        "pacemaker", "pacemaker-libs",
    ]
    assert [a["package"]["name"] for a in out["ALSA-2021:4386"]["affected"]] == [
        "binutils",
    ]
    assert [a["package"]["name"] for a in out["ALSA-9999:0001"]["affected"]] == [
        "lua",
    ]
    assert [a["package"]["name"] for a in out["ALSA-2021:4393"]["affected"]] == [
        "cups", "cups", "cups-libs",
    ]
    # clone copies the source entry's ecosystem (package struct clone)
    clone = out["ALSA-2019:3706"]["affected"][-1]
    assert clone["package"]["ecosystem"] == "AlmaLinux:8"


def test_clone_inherits_modularity_and_keying(spark):
    out = _run(
        spark,
        [("8", "ALSA-2021:4587", "1.6.3", "Important: gcc:11 security update", _aff("gcc"))],
    )
    rec = out["ALSA-2021:4587"]
    assert rec["key"] == "almalinux8/ALSA-2021:4587"
    assert rec["schema_version"] == "1.6.3"
    assert rec["record_type"] == "advisory"
    names = [a["package"]["name"] for a in rec["affected"]]
    assert names == ["gcc", "libgcc"]
    # modularity stamped BEFORE cloning -> the clone carries it
    assert rec["affected"][1]["ecosystem_specific"] == {"rpm_modularity": "gcc:11"}


def test_schema_version_default(spark):
    out = _run(spark, [("10", "A-10", None, "s", _aff("x"))])
    assert out["A-10"]["schema_version"] == "1.7.0"
    assert out["A-10"]["key"] == "almalinux10/A-10"


def test_modularity_strips_tabs_like_str_strip(spark):
    """The reference trims module_info with str.strip()
    (alma/parser.py:160), which removes tabs/newlines too — F.trim
    only strips ASCII spaces, so 'Moderate: \\tmod:1 update' must
    still yield 'mod:1' (r11 ADVICE)."""
    out = _run(
        spark,
        [
            ("8", "A-20", None, "Moderate: \tmariadb:10.3 security update",
             _aff("mariadb")),
            ("8", "A-21", None, "Moderate: nodejs:16\t security update",
             _aff("nodejs")),
        ],
    )
    assert out["A-20"]["affected"][0]["ecosystem_specific"] == {
        "rpm_modularity": "mariadb:10.3"
    }
    assert out["A-21"]["affected"][0]["ecosystem_specific"] == {
        "rpm_modularity": "nodejs:16"
    }
