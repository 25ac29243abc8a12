"""Generation-addressed tables: publish is atomic-by-pointer, time
travel and rollback re-point without data movement, vacuum never
deletes the current target even when the pointer was rolled back."""

from __future__ import annotations

import tempfile

import pytest

from crypto_data_pipeline_spark.sources import generations as gen


def _frame(spark, tag: str):
    return spark.createDataFrame([(1, tag), (2, tag)], "id long, tag string")


def test_publish_read_rollback_cycle(spark):
    root = tempfile.mkdtemp(prefix="gens_") + "/t"
    assert gen.publish(_frame(spark, "v0"), root) == 0
    assert gen.publish(_frame(spark, "v1"), root) == 1
    assert gen.current_generation(spark, root) == 1
    assert {r.tag for r in gen.read_current(spark, root).collect()} == {"v1"}
    # time travel to the old snapshot without changing the pointer
    assert {r.tag for r in gen.read_generation(spark, root, 0).collect()} == {"v0"}
    assert gen.current_generation(spark, root) == 1
    # rollback re-points; the next publish continues the sequence
    gen.rollback(spark, root, 0)
    assert {r.tag for r in gen.read_current(spark, root).collect()} == {"v0"}
    assert gen.publish(_frame(spark, "v2"), root) == 2
    assert {r.tag for r in gen.read_current(spark, root).collect()} == {"v2"}


def test_rollback_to_missing_generation_refuses(spark):
    root = tempfile.mkdtemp(prefix="gens_") + "/t"
    gen.publish(_frame(spark, "v0"), root)
    with pytest.raises(ValueError, match="does not exist"):
        gen.rollback(spark, root, 7)


def test_vacuum_keeps_current_even_after_rollback(spark):
    root = tempfile.mkdtemp(prefix="gens_") + "/t"
    for i in range(4):
        gen.publish(_frame(spark, f"v{i}"), root)
    gen.rollback(spark, root, 0)  # current now the OLDEST
    dropped = gen.vacuum(spark, root, keep_last=2)
    # newest two (2,3) kept by retention; gen 0 kept because current
    assert dropped == [1]
    assert {r.tag for r in gen.read_current(spark, root).collect()} == {"v0"}
    assert gen.list_generations(spark, root) == [0, 2, 3]


def test_missing_pointer_falls_back_to_highest_complete(spark):
    """Mid-flip crash window: pointer absent -> readers degrade to the
    newest written generation, never to an error or a partial view."""
    root = tempfile.mkdtemp(prefix="gens_") + "/t"
    gen.publish(_frame(spark, "v0"), root)
    gen.publish(_frame(spark, "v1"), root)
    jvm, fs, _ = gen._fs(spark, root)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/_CURRENT"), False)
    assert gen.current_generation(spark, root) == 1
    assert {r.tag for r in gen.read_current(spark, root).collect()} == {"v1"}


def test_empty_root_reports_no_generations(spark):
    root = tempfile.mkdtemp(prefix="gens_") + "/missing"
    assert gen.list_generations(spark, root) == []
    assert gen.current_generation(spark, root) is None
    with pytest.raises(FileNotFoundError):
        gen.read_current(spark, root)


def test_upsert_publish_is_transactional(spark):
    """Merge semantics identical to the staging-swap upsert, but each
    merge is a new generation: old snapshots stay readable and a bad
    batch rolls back in O(1)."""
    root = tempfile.mkdtemp(prefix="gens_up_") + "/t"
    day1 = spark.createDataFrame(
        [("btc", "2025-01-01", 100.0, 1), ("eth", "2025-01-01", 10.0, 1)],
        "coin string, day string, price double, seq long",
    )
    g0 = gen.upsert_publish(day1, root, keys=["coin", "day"], order_by=["seq"])
    bad_batch = spark.createDataFrame(
        [("btc", "2025-01-01", -999.0, 2)],  # corrupted feed overwrite
        "coin string, day string, price double, seq long",
    )
    g1 = gen.upsert_publish(bad_batch, root, keys=["coin", "day"], order_by=["seq"])
    assert (g0, g1) == (0, 1)
    cur = {(r.coin, r.day): r.price for r in gen.read_current(spark, root).collect()}
    assert cur[("btc", "2025-01-01")] == -999.0  # last write won, as specified
    # the bad batch is one rollback away — no data surgery
    gen.rollback(spark, root, g0)
    cur = {(r.coin, r.day): r.price for r in gen.read_current(spark, root).collect()}
    assert cur[("btc", "2025-01-01")] == 100.0
    # and the next good merge builds on whatever is CURRENT
    fix = spark.createDataFrame(
        [("btc", "2025-01-01", 101.0, 3)],
        "coin string, day string, price double, seq long",
    )
    gen.upsert_publish(fix, root, keys=["coin", "day"], order_by=["seq"])
    cur = {(r.coin, r.day): r.price for r in gen.read_current(spark, root).collect()}
    assert cur == {("btc", "2025-01-01"): 101.0, ("eth", "2025-01-01"): 10.0}


def test_generation_diff_classifies_all_change_kinds(spark):
    """Publish two generations and diff them: added / removed /
    changed / unchanged (absent) — plus null-safe comparison: a value
    flipping to NULL counts as changed, NULL->NULL does not."""
    root = tempfile.mkdtemp(prefix="gens_") + "/t"
    v0 = spark.createDataFrame(
        [(1, "a", None), (2, "b", 10), (3, "c", 30), (4, None, 40)],
        "id long, tag string, val int",
    )
    v1 = spark.createDataFrame(
        [(2, "b", 10), (3, "c", None), (4, None, 40), (5, "e", 50)],
        "id long, tag string, val int",
    )
    gen.publish(v0, root)
    gen.publish(v1, root)
    d = {
        r["id"]: r["change"]
        for r in gen.generation_diff(spark, root, 0, 1, ["id"]).collect()
    }
    # 1 removed; 2 unchanged (absent); 3 changed (30 -> NULL);
    # 4 unchanged despite a NULL field (null-safe equality); 5 added
    assert d == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_refuses_keys_only_tables(spark):
    keys_only = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        gen.snapshot_diff(keys_only, keys_only, ["id"])
