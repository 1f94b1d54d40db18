"""Golden end-to-end snapshots, one per provider pipeline DAG.

The reference gates every provider on byte-wise result snapshots
(tests/conftest.py:203-244 ``assert_result_snapshots``: the emitted
workspace files are diffed against committed fixtures, and the run FAILS
if a committed snapshot was not asserted).  This is the engine-side
analogue: each end-to-end DAG query runs at sf0.001, its rows serialize
canonically (sorted columns, sorted rows, typed scalars stringified) to
JSONL, and the bytes must equal the committed file under
``tests/snapshots/``.

Unlike the per-query DuckDB oracle (which proves each operator's algebra
independently), a snapshot pins the COMPOSED output of the whole DAG —
any behavioral drift in any stage shows up as a reviewable diff.

Update intentionally: ``SNAPSHOT_UPDATE=1 python -m pytest
tests/test_snapshots.py`` rewrites the files; the diff then documents
the behavior change in review.
"""

from __future__ import annotations

import json
import os

import pytest

from vunnel_spark.registry import REGISTRY, _ensure_loaded

SNAP_DIR = os.path.join(os.path.dirname(__file__), "snapshots")
SF_DIR = "/root/testdata/sf0.001"

#: every provider end-to-end DAG in the registry
PIPELINE_DAGS = [
    "secdb1_end_to_end_dag",
    "alas1_end_to_end_dag",
    "kev1_end_to_end_dag",
    "epss1_end_to_end_dag",
    "eol1_end_to_end_dag",
    "nvd1_full_corpus_reemit",
    "rhel1_parse_cve_dag",
    "ubuntu1_pro_inference",
    "ubuntu2_osv_downconvert",
    "osv1_fixdate_patch",
    "debian1_legacy_merge_dag",
    "oval1_resolution_dag",
    "sles1_not_affected_dag",
    "ghsa1_per_ecosystem_dag",
    "arch1_avg_assembly_dag",
    "hummingbird1_csaf_subset_dag",
    "mariner1_oval_graph_dag",
    "photon1_advisory_patch_dag",
    "fedora1_bodhi_merge_dag",
    "echo1_rolling_merge_dag",
    "secureos1_secdb_range_dag",
    "alma1_osv_normalize_dag",
    "openvex1_libraries_dag",
]


def _canon_value(v):
    import datetime
    import decimal
    import math

    if v is None or isinstance(v, (str, int, bool)):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        import hashlib

        return f"bytes:sha256:{hashlib.sha256(bytes(v)).hexdigest()}"
    if isinstance(v, list):
        return [_canon_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _canon_value(x) for k, x in v.items()}
    return str(v)


def _snapshot_text(df) -> str:
    lines = sorted(
        json.dumps(_canon_value(row.asDict(recursive=True)), sort_keys=True)
        for row in df.collect()
    )
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("name", PIPELINE_DAGS)
def test_pipeline_golden_snapshot(spark, name):
    _ensure_loaded()
    content = _snapshot_text(REGISTRY[name].fn(spark, SF_DIR))
    path = os.path.join(SNAP_DIR, f"{name}.jsonl")
    if os.environ.get("SNAPSHOT_UPDATE"):
        os.makedirs(SNAP_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(content)
        return
    assert os.path.exists(path), (
        f"no committed snapshot for {name}; generate one deliberately with "
        "SNAPSHOT_UPDATE=1"
    )
    with open(path) as f:
        committed = f.read()
    assert committed == content, (
        f"{name} output drifted from its committed snapshot "
        f"({path}); if the change is intended, regenerate with "
        "SNAPSHOT_UPDATE=1 and review the diff"
    )


def test_every_committed_snapshot_is_asserted():
    """The reference fails a provider test run when a committed snapshot
    exists that nothing asserted — dead evidence rots.  Same rule here:
    the snapshot dir must contain exactly the files this module pins."""
    _ensure_loaded()
    committed = {f for f in os.listdir(SNAP_DIR) if f.endswith(".jsonl")}
    assert committed == {f"{n}.jsonl" for n in PIPELINE_DAGS}, (
        committed ^ {f"{n}.jsonl" for n in PIPELINE_DAGS}
    )
