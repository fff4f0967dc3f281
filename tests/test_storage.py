"""Storage-seam contract tests (ops/storage.py): the hive-partitioned
parquet layout the seam writes must give partition-pruned scans to ANY
fresh reader — not just inside build_tiled_index where PLANS.md asserts
it.  This is the property the documented 1:1 Iceberg mapping preserves
(identity partition on cell_id -> partition pruning), so it is the
contract a production swap must keep."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from learnedspatial_spark.ops import storage


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def test_partitioned_roundtrip_prunes_on_fresh_session(spark, tmp_path):
    path = str(tmp_path / "tiled")
    df = spark.range(1000).select(
        F.col("id").alias("pid"),
        (F.col("id") % 8).alias("cell_id"),
        (F.col("id") * 0.5).alias("y"))
    storage.write_partitioned(df, path, "cell_id")

    # runtime proof, not just plan text: plant a CORRUPT parquet file in a
    # non-matching partition dir BEFORE the fresh reader lists the table —
    # a pruned scan never opens it, an unpruned scan fails on its footer
    # (inputFiles() reports the relation's files BEFORE pruning, so it
    # cannot serve as the witness)
    poison = tmp_path / "tiled" / "cell_id=2" / "part-poison.snappy.parquet"
    poison.write_bytes(b"this is not a parquet file")

    # a FRESH session (new catalog/conf state, same JVM) — the reader must
    # rediscover the partition layout from the files alone
    fresh = spark.newSession()
    t = storage.read_table(fresh, path)

    # single-cell predicate prunes at the source: the cell filter appears
    # as PartitionFilters on the scan, not as a post-scan Filter
    q = t.where(F.col("cell_id") == 3)
    plan = _explain(q)
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell_id" in ln and "3" in ln for ln in pf), pf

    # values round-trip exactly (partition column comes back typed)
    got = sorted((r["pid"], r["cell_id"], r["y"]) for r in q.collect())
    want = sorted((i, i % 8, i * 0.5) for i in range(1000) if i % 8 == 3)
    assert got == want

    # candidate-set predicate (the engine's probe shape) prunes too
    q2 = t.where(F.col("cell_id").isin([1, 5]))
    assert q2.count() == 250

    # the witness is live: an UNPRUNED query over the poisoned partition's
    # data DOES hit the corrupt footer
    import pytest
    with pytest.raises(Exception):
        t.select(F.sum("pid")).collect()


def test_partitioned_overwrite_replaces_whole_table(spark, tmp_path):
    """Static partitioned overwrite truncates the table dir — the property
    the checkpoint-manifest reset (changed partitioner spec) relies on:
    no stale cells from a previous spec can survive a rebuild."""
    path = str(tmp_path / "tiled2")
    a = spark.range(100).select(F.col("id").alias("pid"),
                                (F.col("id") % 10).alias("cell_id"))
    storage.write_partitioned(a, path, "cell_id")
    b = spark.range(40).select(F.col("id").alias("pid"),
                               (F.col("id") % 2).alias("cell_id"))
    storage.write_partitioned(b, path, "cell_id")
    t = storage.read_table(spark, path)
    assert t.count() == 40
    cells = {r["cell_id"] for r in t.select("cell_id").distinct().collect()}
    assert cells == {0, 1}  # cells 2..9 from the old spec are gone


def test_overwrite_partitions_snapshot_isolated_crash_resume(spark, tmp_path):
    """VERDICT r4 #3 executed, not asserted: the snapshot protocol's
    per-partition overwrite survives a writer crash.  (a) After a crash
    mid-overwrite (data staged, commit never happened) the partition dirs
    are TORN (orphan files present on disk) yet committed readers still
    see exactly the original table — this assertion fails for any
    implementation that overwrites in place or reads raw listings.
    (b) Resuming the same overwrite vacuums the orphans and lands the new
    data EXACTLY ONCE — a duplicate-counting failure if resume replayed
    on top of the torn state.  (c) Untouched partitions never change."""
    path = str(tmp_path / "snap_tbl")
    base = spark.range(800).select(
        F.col("id").alias("pid"), (F.col("id") % 8).alias("cell_id"),
        (F.col("id") * 1.0).alias("v"))
    storage.create_table_snapshot(base, path, "cell_id")
    t0 = storage.read_committed(spark, path, "cell_id")
    want_base = sorted((r["pid"], r["cell_id"], r["v"]) for r in t0.collect())
    assert len(want_base) == 800

    # the overwrite payload: cells 1 and 2 get NEW, differently-sized data
    new12 = spark.range(30).select(
        (F.col("id") + 10_000).alias("pid"),
        (F.col("id") % 2 + 1).alias("cell_id"),
        F.lit(-1.0).alias("v"))

    # --- crash before commit: torn dirs on disk, intact committed reads
    storage.overwrite_partitions(new12, path, "cell_id", crash_before_commit=True)
    import os
    torn = [d for d in os.listdir(path) if d.startswith("cell_id=")
            and len([f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")]) > 1]
    assert torn, "crash must leave orphan files (otherwise the test is vacuous)"
    got_after_crash = sorted(
        (r["pid"], r["cell_id"], r["v"])
        for r in storage.read_committed(spark, path, "cell_id").collect())
    assert got_after_crash == want_base  # snapshot isolation held

    # --- resume: same call again, completing this time
    storage.overwrite_partitions(new12, path, "cell_id")
    got = sorted((r["pid"], r["cell_id"], r["v"])
                 for r in storage.read_committed(spark, path, "cell_id").collect())
    want = sorted([(p, c, v) for (p, c, v) in want_base if c not in (1, 2)]
                  + [(10_000 + i, i % 2 + 1, -1.0) for i in range(30)])
    assert got == want  # exactly once: no duplicates from the torn attempt

    # --- no uncommitted files survive the completed overwrite
    assert storage.vacuum_uncommitted(path, "cell_id") == 0
    # committed reads still prune on the partition column: the snapshot
    # file list + basePath must keep hive partition recovery, so the cell
    # predicate lands in PartitionFilters, not a post-scan Filter
    q = storage.read_committed(spark, path, "cell_id").where(F.col("cell_id") == 3)
    plan = _explain(q)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell_id" in ln and "3" in ln for ln in pf), pf
    assert q.count() == 100


def test_overwrite_retains_superseded_files_for_inflight_readers(spark, tmp_path):
    """A reader that resolved the PRE-commit snapshot (a lazy DataFrame
    holding the old file list) must keep working after a later
    overwrite_partitions commit — Iceberg retains old-snapshot data files
    until an explicit expireSnapshots.  Fails with FileNotFoundException
    if the commit eagerly vacuums the files it superseded."""
    path = str(tmp_path / "snap_tbl2")
    base = spark.range(400).select(
        F.col("id").alias("pid"), (F.col("id") % 4).alias("cell_id"),
        (F.col("id") * 1.0).alias("v"))
    storage.create_table_snapshot(base, path, "cell_id")
    # in-flight reader: file list resolved against snapshot v1, lazy plan
    t_old = storage.read_committed(spark, path, "cell_id")
    want_old = sorted((r["pid"], r["cell_id"], r["v"]) for r in t_old.collect())

    new2 = spark.range(10).select(
        (F.col("id") + 50_000).alias("pid"), F.lit(2).alias("cell_id"),
        F.lit(-2.0).alias("v"))
    snap = storage.overwrite_partitions(new2, path, "cell_id")
    assert snap["superseded"], "commit must record the replaced v1 files"

    # the v1 reader re-executes its plan AFTER the commit: every file it
    # listed must still exist (retention), and it sees the OLD data
    got_old = sorted((r["pid"], r["cell_id"], r["v"]) for r in t_old.collect())
    assert got_old == want_old
    # a fresh committed reader sees the new data
    t_new = storage.read_committed(spark, path, "cell_id")
    assert t_new.where(F.col("cell_id") == 2).count() == 10
    # the retained files are NOT orphans: vacuum must leave them alone
    assert storage.vacuum_uncommitted(path, "cell_id") == 0
    assert sorted((r["pid"], r["cell_id"], r["v"]) for r in t_old.collect()) == want_old

    # explicit expiry reclaims them; only then does the old plan break
    removed = storage.expire_superseded(path)
    assert removed == len(snap["superseded"])
    assert storage.load_snapshot(path)["superseded"] == []
    import pytest
    with pytest.raises(Exception):
        t_old.collect()
    # current snapshot unaffected by expiry
    assert t_new.count() == 400 - 100 + 10
