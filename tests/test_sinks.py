"""Sink round-trip tests: write -> re-read -> content identical; dedup
modes; first-observed merge idempotence; checksum listing tamper detection.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from vunnel_spark.session import load_table
from vunnel_spark.sinks import EnvelopeWriter, first_observed_merge, write_checksum_listing
from vunnel_spark.sinks.writers import envelope, validate_checksum_listing


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path)


def test_envelope_roundtrip(spark, sf_dir, outdir):
    orders = load_table(spark, sf_dir, "orders")
    env = envelope(orders, "schema/os/v1", "o_orderkey", ["o_orderstatus", "o_totalprice"])
    path = os.path.join(outdir, "results")
    EnvelopeWriter(path, dedup=None).write(env)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == {"schema", "identifier", "item"}
    # value round-trip on a sample key
    row = back.filter(F.col("identifier") == "1").collect()[0]
    src = orders.filter(F.col("o_orderkey") == 1).collect()[0]
    assert row.item.o_totalprice == src.o_totalprice


def test_dedup_modes(spark, outdir):
    df = spark.createDataFrame(
        [("a", 1, "first"), ("a", 2, "second"), ("b", 1, "only")],
        "identifier string, seq int, payload string",
    )
    p_last = os.path.join(outdir, "last")
    EnvelopeWriter(p_last, dedup="last_wins", order_col="seq").write(df)
    last = {r.identifier: r.payload for r in spark.read.parquet(p_last).collect()}
    assert last == {"a": "second", "b": "only"}

    p_first = os.path.join(outdir, "first")
    EnvelopeWriter(p_first, dedup="first_wins", order_col="seq").write(df)
    first = {r.identifier: r.payload for r in spark.read.parquet(p_first).collect()}
    assert first == {"a": "first", "b": "only"}


def test_overwrite_swaps_atomically(spark, outdir):
    path = os.path.join(outdir, "swap")
    w = EnvelopeWriter(path, dedup=None)
    w.write(spark.createDataFrame([("a",)], "identifier string"))
    w.write(spark.createDataFrame([("b",), ("c",)], "identifier string"))
    vals = {r.identifier for r in spark.read.parquet(path).collect()}
    assert vals == {"b", "c"}
    assert not os.path.exists(path + ".__old__")


def test_first_observed_merge_idempotent(spark, outdir):
    path = os.path.join(outdir, "fixdates")
    keys1 = spark.createDataFrame([("v1", "p1"), ("v2", "p1")], "vuln string, pkg string")
    out1 = first_observed_merge(spark, path, keys1, ["vuln", "pkg"], today="2026-01-01")
    assert out1.count() == 2

    # re-merge same keys with a later 'today': dates must NOT change
    out2 = first_observed_merge(spark, path, keys1, ["vuln", "pkg"], today="2026-02-02")
    dates = {(r.vuln, r.pkg): str(r.first_observed) for r in out2.collect()}
    assert set(dates.values()) == {"2026-01-01"}

    # new key gets the new date; old keys keep theirs
    keys2 = spark.createDataFrame([("v1", "p1"), ("v3", "p9")], "vuln string, pkg string")
    out3 = first_observed_merge(spark, path, keys2, ["vuln", "pkg"], today="2026-03-03")
    dates = {(r.vuln, r.pkg): str(r.first_observed) for r in out3.collect()}
    assert dates[("v1", "p1")] == "2026-01-01"
    assert dates[("v3", "p9")] == "2026-03-03"
    assert len(dates) == 3


def test_checksum_listing_detects_tamper(spark, outdir):
    path = os.path.join(outdir, "data")
    EnvelopeWriter(path, dedup=None).write(
        spark.createDataFrame([("x", 1)], "identifier string, v int")
    )
    listing = os.path.join(outdir, "listing.json")
    doc = write_checksum_listing(path, listing)
    assert doc["files"] and validate_checksum_listing(path, listing)
    # tamper with one data file -> validation must fail
    victim = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    with open(os.path.join(path, victim), "ab") as f:
        f.write(b"tamper")
    assert not validate_checksum_listing(path, listing)


def test_overwrite_partitions_freezes_absent(spark, outdir):
    from vunnel_spark.sinks.writers import overwrite_partitions

    path = os.path.join(outdir, "frag")
    day1 = spark.createDataFrame(
        [("pypi", "a", 1), ("npm", "b", 1), ("rpm", "c", 1)], "eco string, id string, run int"
    )
    overwrite_partitions(day1, path, "eco")
    # day 2: only pypi and npm present; rpm must stay frozen at run=1
    day2 = spark.createDataFrame(
        [("pypi", "a2", 2), ("npm", "b2", 2)], "eco string, id string, run int"
    )
    overwrite_partitions(day2, path, "eco")
    rows = {(r.eco, r.id, r.run) for r in spark.read.parquet(path).collect()}
    assert rows == {("pypi", "a2", 2), ("npm", "b2", 2), ("rpm", "c", 1)}


def test_snapshot_import_gates(spark, outdir):
    from vunnel_spark.sinks.writers import import_snapshot, publish_snapshot

    snap = os.path.join(outdir, "snapA")
    dest = os.path.join(outdir, "installed")
    df = spark.createDataFrame([("v1", 1)], "id string, n int")
    df.write.parquet(snap)
    publish_snapshot(snap, built="2026-01-01T00:00:00")

    # fresh install
    assert import_snapshot(snap, dest) == "imported"
    assert {r.id for r in spark.read.parquet(dest).collect()} == {"v1"}

    # same-age snapshot: skip-compute path (nothing rewritten)
    assert import_snapshot(snap, dest) == "skipped"

    # newer snapshot replaces
    snap2 = os.path.join(outdir, "snapB")
    spark.createDataFrame([("v2", 2)], "id string, n int").write.parquet(snap2)
    publish_snapshot(snap2, built="2026-06-01T00:00:00")
    assert import_snapshot(snap2, dest) == "imported"
    assert {r.id for r in spark.read.parquet(dest).collect()} == {"v2"}

    # forced import ignores the newer check but still validates checksums
    assert import_snapshot(snap, dest, skip_newer_check=True) == "imported"
    assert {r.id for r in spark.read.parquet(dest).collect()} == {"v1"}


def test_snapshot_import_rejects_tampered(spark, outdir):
    import glob as _glob

    import pytest as _pytest

    from vunnel_spark.sinks.writers import import_snapshot, publish_snapshot

    snap = os.path.join(outdir, "snapT")
    dest = os.path.join(outdir, "installedT")
    spark.createDataFrame([("v1", 1)], "id string, n int").write.parquet(snap)
    publish_snapshot(snap, built="2026-01-01T00:00:00")
    part = _glob.glob(os.path.join(snap, "part-*.parquet"))[0]
    with open(part, "ab") as f:
        f.write(b"corrupt")
    with _pytest.raises(ValueError, match="checksum"):
        import_snapshot(snap, dest)
    assert not os.path.exists(dest), "tampered snapshot must not install"


def test_dedup_without_order_col_stable_across_partitioning(spark, outdir):
    """A12 semantics must not depend on partition layout: with no
    order_col the surviving duplicate is picked by a content hash, so the
    same data written under different partitionings yields byte-identical
    results (the old monotonically_increasing_id fallback did not)."""
    rows = [("a", i, f"payload-{i}") for i in range(6)] + [("b", 0, "only")]
    df = spark.createDataFrame(rows, "identifier string, seq int, payload string")

    outs = []
    for i, shaped in enumerate([df.repartition(1), df.repartition(8, "seq"), df.coalesce(2)]):
        p = os.path.join(outdir, f"stable{i}")
        EnvelopeWriter(p, dedup="last_wins").write(shaped)
        outs.append(sorted(
            (r.identifier, r.seq, r.payload)
            for r in spark.read.parquet(p).collect()
        ))
    assert outs[0] == outs[1] == outs[2]
    assert [r[0] for r in outs[0]] == ["a", "b"]


def test_hash_bucket_keyed_read_prunes_and_matches(spark, sf_dir, outdir):
    # metastore-free hash bucketing: read_keys must (a) return exactly
    # the filter-on-full-read rows, (b) fold each key's bucket to a
    # literal so PartitionFilters prune unmatched bucket dirs, (c) hide
    # the layout column from both read paths
    import re

    path = os.path.join(outdir, "bucketed_store")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ident"), F.col("o_totalprice").alias("price")
    )
    w = EnvelopeWriter(path, key="ident", order_col="ident", hash_buckets=8)
    w.write(orders)

    keys = [11, 23, 35]
    got = {r.ident for r in w.read_keys(spark, keys).collect()}
    want = {r.ident for r in w.read(spark).filter(F.col("ident").isin(keys)).collect()}
    assert got == want and got == set(keys)

    df = w.read_keys(spark, keys)
    p = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)", p)
    assert m and "_bucket" in m.group(1), p
    # folded literals, strictly fewer buckets than written
    n_buckets = len(re.findall(r"_bucket#\d+ = \d+", m.group(1)))
    assert 0 < n_buckets < 8, m.group(1)
    assert "_bucket" not in df.columns
    assert "_bucket" not in w.read(spark).columns
    # the layout really is hive-partitioned on disk
    assert any(d.startswith("_bucket=") for d in os.listdir(path)), os.listdir(path)


def test_recover_backup_restores_crashed_swap(spark, tmp_path):
    """A hard kill between _atomic_install's two renames leaves the prior
    store parked as __old__ with nothing at the path; the next write must
    restore it, not treat the store as empty."""
    import os

    from vunnel_spark.sinks.writers import _recover_backup

    path = str(tmp_path / "store")
    spark.range(5).write.parquet(path)
    os.rename(path, f"{path}.__old__")  # simulate the crash window
    _recover_backup(path)
    assert spark.read.parquet(path).count() == 5
    assert not os.path.exists(f"{path}.__old__")


# --------------------------------------------------- table-format adapter

def test_delta_adapter_availability_probe(spark):
    """delta_available() must answer without raising in every
    environment; in this container (no delta-spark) it reports False and
    both sink idioms fall back to the parquet swap."""
    from vunnel_spark.sinks.table_format import delta_available

    assert delta_available(spark) in (True, False)


def test_forced_delta_raises_cleanly_when_unavailable(spark, tmp_path):
    import pytest

    from vunnel_spark.sinks.table_format import delta_available
    from vunnel_spark.sinks.writers import first_observed_merge, overwrite_partitions

    if delta_available(spark):
        pytest.skip("delta-spark present; the forced path is exercised below")
    obs = spark.createDataFrame([("k1",), ("k2",)], "k string")
    with pytest.raises(RuntimeError, match="delta-spark"):
        first_observed_merge(
            spark, str(tmp_path / "fo"), obs, ["k"], table_format="delta"
        )
    with pytest.raises(RuntimeError, match="delta-spark"):
        overwrite_partitions(
            obs.withColumn("p", obs.k), str(tmp_path / "ow"), "p",
            table_format="delta",
        )


def test_delta_merge_and_replacewhere_roundtrip(spark, tmp_path):
    """Runs only where delta-spark is installed (CI with the jar): the
    MERGE INTO path must keep first_observed_merge's insert-on-miss
    idempotence, and replaceWhere must leave absent partitions frozen."""
    import pytest

    from vunnel_spark.sinks.table_format import delta_available
    from vunnel_spark.sinks.writers import first_observed_merge, overwrite_partitions

    if not delta_available(spark):
        pytest.skip("delta-spark not on the classpath")

    fo = str(tmp_path / "fo")
    obs1 = spark.createDataFrame([("a",), ("b",)], "k string")
    got1 = first_observed_merge(spark, fo, obs1, ["k"], today="2026-01-01")
    assert got1.count() == 2
    # re-merge same keys + one new key on a later day: dates never change
    obs2 = spark.createDataFrame([("a",), ("c",)], "k string")
    got2 = {r.k: str(r.first_observed)
            for r in first_observed_merge(spark, fo, obs2, ["k"],
                                          today="2026-02-02").collect()}
    assert got2 == {"a": "2026-01-01", "b": "2026-01-01", "c": "2026-02-02"}

    ow = str(tmp_path / "ow")
    day1 = spark.createDataFrame([("p1", 1), ("p2", 2)], "p string, v int")
    overwrite_partitions(day1, ow, "p")
    day2 = spark.createDataFrame([("p2", 20)], "p string, v int")
    overwrite_partitions(day2, ow, "p")
    rows = {(r.p, r.v) for r in
            spark.read.format("delta").load(ow).collect()}
    assert rows == {("p1", 1), ("p2", 20)}  # p1 frozen, p2 replaced


# ------------------------------------------------------------- compaction

def _parquet_files(d):
    import glob as g
    import os

    return sorted(
        p for p in g.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
    )


def test_compact_partitions_rewrites_only_fragmented_dirs(spark, tmp_path):
    import os

    from vunnel_spark.sinks.writers import compact_partitions

    store = str(tmp_path / "store")
    # partition p=a: 3 fragmented appends x 4 files; p=b: one small append
    for i in range(3):
        (
            spark.range(i * 100, (i + 1) * 100)
            .selectExpr("'a' AS p", "id AS v")
            .repartition(4)
            .write.mode("append").partitionBy("p").parquet(store)
        )
    spark.createDataFrame([("b", -1)], "p string, v long").write.mode(
        "append"
    ).partitionBy("p").parquet(store)

    before_a = _parquet_files(os.path.join(store, "p=a"))
    before_b = _parquet_files(os.path.join(store, "p=b"))
    assert len(before_a) == 12
    rows_before = {(r.p, r.v) for r in spark.read.parquet(store).collect()}

    report = compact_partitions(spark, store, min_files=4)
    assert list(report) == ["p=a"] and report["p=a"][0] == 12
    after_a = _parquet_files(os.path.join(store, "p=a"))
    assert len(after_a) == report["p=a"][1] < 12
    # p=b untouched: identical file list
    assert _parquet_files(os.path.join(store, "p=b")) == before_b
    # pure re-layout: reader-visible rows identical
    assert {(r.p, r.v) for r in spark.read.parquet(store).collect()} == rows_before
    # no stage/backup residue, and nothing '='-named the discovery could list
    assert not os.path.exists(store + ".__compact__")
    assert not os.path.exists(store + ".__old__")
    # idempotent: a second pass finds nothing to do
    assert compact_partitions(spark, store, min_files=4) == {}


def test_compact_partitions_recovers_parked_backup(spark, tmp_path):
    import os

    from vunnel_spark.sinks.writers import compact_partitions

    store = str(tmp_path / "store")
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "p string, v long"
    ).write.partitionBy("p").parquet(store)
    # simulate a crash between _atomic_install's renames: p=a parked
    # outside the store, nothing at its destination
    os.makedirs(store + ".__old__", exist_ok=True)
    os.rename(os.path.join(store, "p=a"), os.path.join(store + ".__old__", "p=a"))
    assert {r.p for r in spark.read.parquet(store).collect()} == {"b"}
    compact_partitions(spark, store)  # recovery runs up front
    assert {(r.p, r.v) for r in spark.read.parquet(store).collect()} == {
        ("a", 1), ("b", 2)
    }
    assert not os.path.exists(store + ".__old__")
