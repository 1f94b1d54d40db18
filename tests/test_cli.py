"""CLI + registry tag-algebra tests (SURVEY U7): include/exclude selection
matching the reference's provider tag filters
(src/vunnel/providers/__init__.py:150-183)."""

from __future__ import annotations

import pytest

from vunnel_spark.cli import main
from vunnel_spark.registry import REGISTRY, _ensure_loaded, select_by_tags

_ensure_loaded()


def test_select_all_when_no_criteria():
    assert select_by_tags(None) == sorted(REGISTRY)
    assert select_by_tags([]) == sorted(REGISTRY)


def test_select_requires_all_include_tags():
    both = select_by_tags(["dedup", "graph"])
    assert both
    for n in both:
        assert {"dedup", "graph"} <= set(REGISTRY[n].tags)
    # superset query: single tag selects at least as many
    assert set(both) <= set(select_by_tags(["dedup"]))


def test_select_excludes_negated_tags():
    sel = select_by_tags(["dedup", "!graph"])
    assert sel
    for n in sel:
        tags = set(REGISTRY[n].tags)
        assert "dedup" in tags and "graph" not in tags
    # include ∪ exclude partitions the include-only set
    assert set(select_by_tags(["dedup"])) == set(sel) | set(
        select_by_tags(["dedup", "graph"])
    )


def test_select_rejects_bare_bang_and_empty():
    with pytest.raises(ValueError):
        select_by_tags(["!"])
    with pytest.raises(ValueError):
        select_by_tags([""])


def test_cli_list_with_tag_algebra(capsys):
    assert main(["list", "--tags", "dedup", "!graph"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    names = {line.split()[0] for line in out}
    assert names == set(select_by_tags(["dedup", "!graph"]))


def test_cli_list_bad_tag_is_error(capsys):
    assert main(["list", "--tags", "!"]) == 2


def test_cli_run_requires_name_or_tags(capsys):
    assert main(["run"]) == 2
    assert main(["run", "x1_token_count_stats", "--tags", "text"]) == 2


def test_cli_clear_removes_known_members_only(tmp_path, capsys):
    import os

    from vunnel_spark.cli import main

    ws = tmp_path / "ws"
    for member in ("input", "results", "checkpoints"):
        (ws / member).mkdir(parents=True)
        (ws / member / "f").write_text("x")
    (ws / "results.__old__").mkdir()          # stale backup from a crash
    (ws / "unrelated").mkdir()                # must survive
    (ws / "_state.json").write_text("{}")

    # dry-run touches nothing
    assert main(["clear", str(ws), "--dry-run"]) == 0
    assert (ws / "results").exists() and (ws / "input").exists()

    assert main(["clear", str(ws), "--results-only"]) == 0
    assert not (ws / "results").exists()
    assert not (ws / "results.__old__").exists()
    assert not (ws / "_state.json").exists()
    assert (ws / "input").exists() and (ws / "unrelated").exists()

    assert main(["clear", str(ws)]) == 0
    assert not (ws / "input").exists()
    assert (ws / "unrelated").exists()

    assert main(["clear", str(ws / "missing")]) == 2
    assert main(["clear", str(ws), "--input-only", "--results-only"]) == 2
