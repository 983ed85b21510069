"""Writer-side crash recovery (round-7 review): the hard-crash window of
atomic_swap_write and its name-tagged backup heal."""

def test_recover_interrupted_swap(spark, tmp_path):
    """Round-7 review: a HARD crash between atomic_swap_write's two renames
    (simulated by hand-staging the exact on-disk state) leaves the target
    missing and the only copy in a name-tagged backup; recovery restores
    it. With the target present, surviving backups are litter and are
    removed."""
    import os
    import shutil

    from etl_data_transformer_spark.sources.writers import (
        atomic_swap_write,
        recover_interrupted_swap,
    )

    target = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    atomic_swap_write(df, target)

    # simulate the crash window: target renamed to backup, second rename
    # never happened
    backup = str(tmp_path / ".backup-t-deadbeef")
    os.rename(target, backup)
    assert not os.path.exists(target)
    assert recover_interrupted_swap(target) is True
    assert [r["v"] for r in spark.read.parquet(target).collect()] == ["a"]
    assert not os.path.exists(backup)
    assert recover_interrupted_swap(target) is False  # idempotent

    # litter case: target alive, stale backup left behind -> swept
    shutil.copytree(target, backup)
    assert recover_interrupted_swap(target) is False
    assert not os.path.exists(backup)
