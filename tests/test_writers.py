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


def test_assign_shards_deterministic_and_balanced(spark):
    import pytest as _pytest

    from etl_data_transformer_spark.operators.curation import assign_shards, shard_manifest

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in assign_shards(df, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in assign_shards(df, 8).collect()}
    assert a == b  # rerun-identical
    counts = {}
    for s, _ in a.values():
        assert 0 <= s < 8
        counts[s] = counts.get(s, 0) + 1
    assert len(counts) == 8 and max(counts.values()) < 3 * min(counts.values())
    # a different seed re-deals the shuffle
    c = {r["doc_id"]: r["shard"] for r in assign_shards(df, 8, seed="epoch1").collect()}
    assert any(c[i] != a[i][0] for i in range(400))
    # manifest positions are contiguous 1..n per shard
    m = shard_manifest(df, 8).collect()
    per = {}
    for r in m:
        per.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for poss in per.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    with _pytest.raises(ValueError, match="n_shards"):
        assign_shards(df, 0)


def test_write_shards_layout_matches_manifest(spark, tmp_path):
    import glob

    from etl_data_transformer_spark.operators.curation import shard_manifest
    from etl_data_transformer_spark.sources.writers import write_shards

    rows = [(i, f"doc {i}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "shards")
    write_shards(df, path, 8)

    want = {}
    for r in shard_manifest(df, 8).collect():
        want.setdefault(r["shard"], []).append((r["pos_in_shard"], r["doc_id"]))
    dirs = sorted(glob.glob(path + "/shard=*"))
    assert len(dirs) == 8
    seen = set()
    for d in dirs:
        k = int(d.rsplit("=", 1)[1])
        # exactly one data file per shard: the shard never splits across
        # tasks, so its directory is one task's single sorted file
        files = [f for f in glob.glob(d + "/*.parquet")]
        assert len(files) == 1
        got = [r["doc_id"] for r in spark.read.parquet(files[0]).collect()]
        assert got == [i for _, i in sorted(want[k])]  # on-disk order == manifest
        assert not seen & set(got)
        seen |= set(got)
    assert seen == {i for i, _ in rows}
    # rerun overwrites with identical contents
    write_shards(df, path, 8)
    again = [
        r["doc_id"]
        for d in dirs
        for r in spark.read.parquet(glob.glob(d + "/*.parquet")[0]).collect()
    ]
    assert again == [i for k in (int(d.rsplit("=", 1)[1]) for d in dirs) for _, i in sorted(want[k])]
    # the export is staged + swapped: a failing rewrite leaves the prior
    # export fully intact (no half-written shard set is ever visible)
    import pytest as _pytest

    bad = spark.createDataFrame([(None, "null id")], "doc_id long, text string")
    with _pytest.raises(Exception, match="deterministically sharded"):
        write_shards(bad, path, 8)
    assert spark.read.parquet(path).count() == 120


def test_assign_shards_rejects_null_ids_and_reserved_columns(spark):
    import pytest as _pytest

    from etl_data_transformer_spark.operators.curation import assign_shards

    with _pytest.raises(ValueError, match="shuffle_key"):
        assign_shards(
            spark.createDataFrame([(1, "x")], "doc_id long, shuffle_key string"), 4
        )
    with _pytest.raises(ValueError, match="`shard`"):
        assign_shards(spark.createDataFrame([(1, 2)], "doc_id long, shard int"), 4)
    nulls = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with _pytest.raises(Exception, match="deterministically sharded"):
        assign_shards(nulls, 4).collect()


def test_write_shards_jsonl_matches_parquet_layout(spark, tmp_path):
    """format='jsonl': same shard assignment, same within-shard
    pseudo-shuffle order (asserted row-for-row against the parquet
    layout by reading each shard's raw lines), staged-swap rerun
    idempotent, bad format rejected."""
    import json
    import os

    import pytest

    from etl_data_transformer_spark.sources.writers import write_shards

    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)], "doc_id long, text string"
    )
    pq, jl = str(tmp_path / "pq"), str(tmp_path / "jl")
    write_shards(df, pq, 4)
    write_shards(df, jl, 4, format="jsonl")
    for k in range(4):
        pdir, jdir = f"{pq}/shard={k}", f"{jl}/shard={k}"
        want = [
            r["doc_id"] for r in spark.read.parquet(pdir).select("doc_id").collect()
        ]
        jfiles = [f for f in os.listdir(jdir) if f.endswith(".json")]
        assert len(jfiles) == 1  # one file per shard, like parquet
        with open(os.path.join(jdir, jfiles[0]), encoding="utf-8") as f:
            got = [json.loads(line)["doc_id"] for line in f if line.strip()]
        assert got == want, k
    # rerun rewrites identical content through the swap
    write_shards(df, jl, 4, format="jsonl")
    assert sorted(os.listdir(jl))[:1] != []  # target present, no staging litter
    assert not [d for d in os.listdir(str(tmp_path)) if d.startswith(".staging")]
    with pytest.raises(ValueError, match="format"):
        write_shards(df, str(tmp_path / "x"), 2, format="csv")
