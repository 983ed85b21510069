"""Unit tests for the round-7 warehouse-lifecycle operators: SCD2 history
build (operators/temporal.scd2_history), snapshot CDC diff
(plans/merge.snapshot_diff) and the data-quality gate
(plans/quality.validate_expectations). The fixture-scale DuckDB value-hash
checks live in tests/test_rotated_oracle.py (scd2_user_state,
snapshot_diff_orders, validate_orders); these pin the semantic corners —
run collapsing, NULL contracts, tie determinism — on handcrafted frames.
"""

from __future__ import annotations

import datetime as dt

import pytest

from etl_data_transformer_spark.operators.temporal import (
    scd2_apply,
    scd2_apply_snapshot,
    scd2_history,
)
from etl_data_transformer_spark.plans.merge import assert_unique, snapshot_diff
from etl_data_transformer_spark.plans.quality import Expectation, validate_expectations


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ------------------------------------------------------------------ scd2 ----


def test_scd2_collapses_consecutive_runs_and_versions(spark):
    rows = [
        (1, "A", _ts("2024-01-01 00:00:00"), 1),
        (1, "A", _ts("2024-01-02 00:00:00"), 2),  # same state: merged
        (1, "B", _ts("2024-01-03 00:00:00"), 3),  # change -> v2
        (1, "A", _ts("2024-01-04 00:00:00"), 4),  # back to A -> v3 (not merged with v1)
        (2, "X", _ts("2024-01-01 00:00:00"), 5),
    ]
    df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
    out = scd2_history(df, ["user_id"], ["state"], "ts", ["eid"])
    got = {(r.user_id, r.version): r for r in out.collect()}
    assert len(got) == 4
    v1, v2, v3 = got[(1, 1)], got[(1, 2)], got[(1, 3)]
    assert (v1.state, v2.state, v3.state) == ("A", "B", "A")
    assert v1.valid_from == _ts("2024-01-01 00:00:00")
    assert v1.valid_to == v2.valid_from == _ts("2024-01-03 00:00:00")
    assert v2.valid_to == v3.valid_from == _ts("2024-01-04 00:00:00")
    assert v3.valid_to is None and v3.is_current
    assert not v1.is_current and not v2.is_current
    assert got[(2, 1)].is_current


def test_scd2_null_states_form_runs_not_versions(spark):
    rows = [
        (1, None, _ts("2024-01-01 00:00:00"), 1),
        (1, None, _ts("2024-01-02 00:00:00"), 2),  # NULL == NULL: merged
        (1, "A", _ts("2024-01-03 00:00:00"), 3),
        (1, None, _ts("2024-01-04 00:00:00"), 4),
    ]
    df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
    out = scd2_history(df, ["user_id"], ["state"], "ts", ["eid"]).orderBy("version")
    states = [r.state for r in out.collect()]
    assert states == [None, "A", None]


def test_scd2_equal_ts_ties_break_on_tiebreaker(spark):
    # two different states observed at the SAME instant: the tiebreaker
    # column decides the version order deterministically
    rows = [
        (1, "B", _ts("2024-01-01 00:00:00"), 2),
        (1, "A", _ts("2024-01-01 00:00:00"), 1),
        (1, "C", _ts("2024-01-02 00:00:00"), 3),
    ]
    df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
    out = scd2_history(df, ["user_id"], ["state"], "ts", ["eid"]).orderBy("version")
    rs = out.collect()
    assert [r.state for r in rs] == ["A", "B", "C"]
    # v1's interval is zero-length (closed at the same instant by v2)
    assert rs[0].valid_to == rs[0].valid_from == rs[1].valid_from


def test_scd2_multi_state_columns_change_on_any_field(spark):
    rows = [
        (1, "A", 10, _ts("2024-01-01 00:00:00"), 1),
        (1, "A", 11, _ts("2024-01-02 00:00:00"), 2),  # second field changed
        (1, "A", 11, _ts("2024-01-03 00:00:00"), 3),  # identical: merged
    ]
    df = spark.createDataFrame(rows, "k int, s1 string, s2 int, ts timestamp, eid int")
    out = scd2_history(df, ["k"], ["s1", "s2"], "ts", ["eid"])
    assert out.count() == 2


def test_scd2_requires_key_and_state():
    with pytest.raises(ValueError):
        scd2_history(None, [], ["s"], "ts")
    with pytest.raises(ValueError):
        scd2_history(None, ["k"], [], "ts")


# ----------------------------------------------------------- scd2_apply ----


_SCD2_ARGS = (["user_id"], ["state"], "ts", ["eid"])


def _feed(spark, rows):
    return spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")


def _rows(df):
    return sorted(
        (repr(r.user_id), repr(r.state), repr(r.valid_from), repr(r.valid_to),
         r.version, r.is_current)
        for r in df.collect()
    )


def test_scd2_apply_equals_full_rebuild(spark):
    """The contract itself: apply(history(f1), f2) == history(f1 ∪ f2) on a
    feed exercising continuation, change, flip-back, same-instant ties in
    the batch, a key untouched by the batch, and a brand-new key."""
    import random

    rng = random.Random(11)
    rows = []
    eid = 0
    for uid in range(6):
        t = dt.datetime(2024, 1, 1)
        for _ in range(rng.randint(2, 9)):
            eid += 1
            rows.append((uid, rng.choice(["A", "B", None]), t, eid))
            t += dt.timedelta(hours=rng.randint(0, 6))  # 0 => same-instant tie
    cutoff = dt.datetime(2024, 1, 2)
    f1 = [r for r in rows if r[2] < cutoff] + [(99, "X", dt.datetime(2024, 1, 1), 900)]
    f2 = [r for r in rows if r[2] >= cutoff] + [(77, "N", dt.datetime(2024, 1, 3), 901)]
    dim = scd2_history(_feed(spark, f1), *_SCD2_ARGS)
    applied = scd2_apply(dim, _feed(spark, f2), *_SCD2_ARGS)
    full = scd2_history(_feed(spark, f1 + f2), *_SCD2_ARGS)
    assert _rows(applied) == _rows(full)


def test_scd2_apply_continuation_and_new_key_paths(spark):
    f1 = [(1, "A", _ts("2024-01-01 00:00:00"), 1), (2, "Z", _ts("2024-01-01 00:00:00"), 2)]
    dim = scd2_history(_feed(spark, f1), *_SCD2_ARGS)
    f2 = [
        (1, "A", _ts("2024-01-02 00:00:00"), 3),  # re-observation: merges, no new version
        (1, "B", _ts("2024-01-03 00:00:00"), 4),  # change: closes v1, opens v2
        (9, "N", _ts("2024-01-02 00:00:00"), 5),  # unseen key: starts at v1
    ]
    got = {(r.user_id, r.version): r for r in scd2_apply(dim, _feed(spark, f2), *_SCD2_ARGS).collect()}
    assert len(got) == 4
    assert got[(1, 1)].valid_to == got[(1, 2)].valid_from == _ts("2024-01-03 00:00:00")
    assert got[(1, 2)].is_current and got[(1, 2)].state == "B"
    # key 2 untouched by the batch: byte-identical pass-through
    assert got[(2, 1)].is_current and got[(2, 1)].valid_to is None
    assert got[(9, 1)].state == "N" and got[(9, 1)].is_current


def test_scd2_apply_rejects_late_rows_unless_opted_out(spark):
    f1 = [(1, "A", _ts("2024-01-05 00:00:00"), 1)]
    dim = scd2_history(_feed(spark, f1), *_SCD2_ARGS)
    late = _feed(spark, [(1, "B", _ts("2024-01-01 00:00:00"), 2)])
    with pytest.raises(ValueError, match="predate"):
        scd2_apply(dim, late, *_SCD2_ARGS)
    # opt-out: best-effort ordering (the late row sorts first)
    got = scd2_apply(dim, late, *_SCD2_ARGS, validate=False).orderBy("version").collect()
    assert [r.state for r in got] == ["B", "A"]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "user_id int, state string")


_EMPTY_DIM_DDL = (
    "user_id int, state string, valid_from timestamp, valid_to timestamp, "
    "version int, is_current boolean"
)


def test_scd2_apply_snapshot_full_lifecycle(spark):
    """Three snapshots exercise every transition: initial build, update,
    DELETION (version closed at the snapshot ts, none opened), unchanged
    carry-through, and RE-INSERTION (version numbering continues past the
    closed history instead of colliding)."""
    t1, t2, t3 = (_ts(f"2024-01-0{i} 00:00:00") for i in (1, 2, 3))
    dim = spark.createDataFrame([], _EMPTY_DIM_DDL)
    dim = scd2_apply_snapshot(dim, _snap(spark, [(1, "A"), (2, "X")]),
                              ["user_id"], ["state"], t1)
    dim = scd2_apply_snapshot(dim, _snap(spark, [(1, "B"), (3, "N")]),
                              ["user_id"], ["state"], t2)  # 2 deleted
    dim = scd2_apply_snapshot(dim, _snap(spark, [(1, "B"), (2, "Y")]),
                              ["user_id"], ["state"], t3)  # 3 deleted, 2 back
    got = {(r.user_id, r.version): r for r in dim.collect()}
    assert len(got) == 5
    # key 1: A then B, B unchanged in s3 -> interval stays open
    assert got[(1, 1)].valid_to == t2 and not got[(1, 1)].is_current
    assert got[(1, 2)].state == "B" and got[(1, 2)].is_current
    assert got[(1, 2)].valid_from == t2 and got[(1, 2)].valid_to is None
    # key 2: deleted at t2 (closed, NO new version), re-inserted at t3 as v2
    assert got[(2, 1)].state == "X" and got[(2, 1)].valid_to == t2
    assert not got[(2, 1)].is_current
    assert got[(2, 2)].state == "Y" and got[(2, 2)].valid_from == t3
    assert got[(2, 2)].is_current
    # key 3: inserted at t2, deleted at t3
    assert got[(3, 1)].valid_from == t2 and got[(3, 1)].valid_to == t3
    assert not got[(3, 1)].is_current
    # no key has any open version besides 1 and 2
    assert sorted(k for (k, _), r in got.items() if r.is_current) == [1, 2]


def test_scd2_apply_snapshot_without_deletes_equals_change_apply(spark):
    t1, t2 = _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00")
    dim = spark.createDataFrame([], _EMPTY_DIM_DDL)
    dim = scd2_apply_snapshot(dim, _snap(spark, [(1, "A"), (2, "X")]),
                              ["user_id"], ["state"], t1)
    via_snapshot = scd2_apply_snapshot(
        dim, _snap(spark, [(1, "B"), (2, "X"), (3, "N")]), ["user_id"], ["state"], t2
    )
    changes = spark.createDataFrame(
        [(1, "B", t2, 1), (2, "X", t2, 2), (3, "N", t2, 3)],
        "user_id int, state string, ts timestamp, eid int",
    )
    via_changes = scd2_apply(dim, changes, ["user_id"], ["state"], "ts", ["eid"])
    assert _rows(via_snapshot) == _rows(via_changes)


def test_scd2_apply_empty_batch_is_identity(spark):
    f1 = [(1, "A", _ts("2024-01-01 00:00:00"), 1), (1, "B", _ts("2024-01-02 00:00:00"), 2)]
    dim = scd2_history(_feed(spark, f1), *_SCD2_ARGS)
    empty = _feed(spark, [])
    assert _rows(scd2_apply(dim, empty, *_SCD2_ARGS)) == _rows(dim)


# --------------------------------------------------------- snapshot_diff ----


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.5), (3, "c", None), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 deleted, 2 updated (2.0 -> 2.5), 3 unchanged (NULL <=> NULL), 4 inserted
    assert got == {1: "deleted", 2: "updated", 4: "inserted"}


def test_snapshot_diff_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k int, v string")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "updated", 2: "updated"}


def test_snapshot_diff_keys_only_presence_changes(spark):
    # no compare columns: only inserted/deleted can appear
    old = spark.createDataFrame([(1,), (2,)], "k int")
    new = spark.createDataFrame([(2,), (3,)], "k int")
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "deleted", 3: "inserted"}


def test_snapshot_diff_requires_keys(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [])


def test_assert_unique(spark):
    ok = spark.createDataFrame([(1,), (2,)], "k int")
    assert assert_unique(ok, ["k"]) is ok
    dup = spark.createDataFrame([(1,), (1,)], "k int")
    with pytest.raises(ValueError, match="not unique"):
        assert_unique(dup, ["k"])


# ------------------------------------------------------------ quality -------


@pytest.fixture(scope="module")
def quality_df(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT", 100),
            (2, "F", -5.0, "5-LOW", 100),      # in_range + matches violations
            (3, "P", 20.0, "2-HIGH", None),    # accepted_values violation, null fk
            (4, None, None, "3-MEDIUM", 999),  # null status/price PASS non-not_null rules
            (4, "O", 30.0, "4-NOT SPECIFIED", 100),  # dup key 4
            (None, "O", 40.0, "1-URGENT", 100),      # null key: not_null fails, unique ignores
        ],
        "k int, status string, price double, prio string, fk int",
    )


def test_validate_expectations_row_rules_null_contract(spark, quality_df):
    ref = spark.createDataFrame([(100,), (200,)], "ck int")
    rules = [
        Expectation.not_null("k"),
        Expectation.unique("k"),
        Expectation.accepted_values("status", "O", "F"),
        Expectation.in_range("price", 0.0, 100.0),
        Expectation.matches("prio", "^[1-4]-"),
        Expectation.expression("price_pos", "price > 0"),
        Expectation.references("fk", ref, "ck"),
    ]
    got = {r.rule: (r.violations, r.passed) for r in validate_expectations(quality_df, rules).collect()}
    assert got["k_not_null"] == (1, False)
    # one duplicated KEY (k=4); the NULL key row is ignored by unique
    assert got["k_unique"] == (1, False)
    # 'P' violates; NULL status passes (null contract)
    assert got["status_accepted_values"] == (1, False)
    # -5.0 violates; NULL price passes
    assert got["price_in_range"] == (1, False)
    assert got["prio_matches"] == (1, False)
    assert got["price_pos"] == (1, False)
    # fk=999 is orphaned; NULL fk ignored
    assert got["fk_references"] == (1, False)


def test_validate_expectations_passing_rules(spark, quality_df):
    rules = [
        Expectation.not_null("prio"),
        Expectation.in_range("price", -10.0, 100.0, name="wide_range"),
    ]
    got = {r.rule: (r.violations, r.passed) for r in validate_expectations(quality_df, rules).collect()}
    assert got == {"prio_not_null": (0, True), "wide_range": (0, True)}


def test_validate_expectations_rejects_bad_input(spark, quality_df):
    with pytest.raises(ValueError, match="no rules"):
        validate_expectations(quality_df, [])
    with pytest.raises(ValueError, match="unique"):
        validate_expectations(
            quality_df,
            [Expectation.not_null("k", name="r"), Expectation.not_null("prio", name="r")],
        )
    with pytest.raises(ValueError, match="unknown rule kind"):
        validate_expectations(quality_df, [Expectation("x", "bogus", ("k",))])


def test_unique_requires_columns():
    # round-8 ADVICE fix: zero-column unique() used to surface as an opaque
    # "reduce() of empty iterable" TypeError deep inside validate_expectations
    with pytest.raises(ValueError, match="at least one column"):
        Expectation.unique()


def test_references_rule_is_hashable_and_comparable(spark):
    # round-8 ADVICE fix: the live dimension DataFrame lives in a
    # compare=False field so generated eq/hash work by value — but the
    # round-9 advice closed the hole that left: the dimension's PLAN
    # fingerprint (semanticHash) is folded into params, so two rules on
    # the same fk/ref_column against genuinely DIFFERENT dimensions no
    # longer compare equal (a dedupe/cache keyed on the rule must keep
    # both), while rules over the same plan still dedupe
    ref_a = spark.createDataFrame([(1,)], "ck int")
    ref_b = spark.createDataFrame([(2,)], "ck int")
    r1 = Expectation.references("fk", ref_a, "ck")
    r2 = Expectation.references("fk", ref_b, "ck")
    assert r1 != r2
    assert len({r1, r2}) == 2
    r1_again = Expectation.references("fk", ref_a, "ck")
    assert r1 == r1_again and hash(r1) == hash(r1_again)
    assert len({r1, r1_again}) == 1
    assert r1.ref is ref_a  # the live object is still reachable


def test_row_level_suite_is_one_scan_one_exchange(spark, quality_df):
    """Pin the module-doc scale claim: the WHOLE row-level suite — here 20
    rules — compiles to ONE table scan and ONE exchange (the single-partition
    final agg). Adding a rule adds a codegen'd accumulator, not a pass."""
    rules = [Expectation.in_range("price", float(i), 100.0 + i, name=f"r{i}") for i in range(18)]
    rules += [Expectation.not_null("k"), Expectation.matches("prio", "^[1-5]-")]
    plan = (
        validate_expectations(quality_df, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan[:3000]
    # exactly one source scan feeds all 20 accumulators
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 1, plan[:3000]


def test_validate_expectations_schema_types(spark, quality_df):
    out = validate_expectations(quality_df, [Expectation.not_null("k")])
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema == {
        "rule": "string",
        "kind": "string",
        "violations": "bigint",
        "passed": "boolean",
    }


def test_scd2_apply_rejects_reinsertion_inside_closed_interval(spark):
    """Round-8 review: a key deleted by scd2_apply_snapshot has no current
    version, so the old current-only validation silently accepted a batch
    row timestamped INSIDE the closed interval (overlapping versions). The
    bound is now the key's closing timestamp."""
    t1, t2 = _ts("2024-01-01 00:00:00"), _ts("2024-02-01 00:00:00")
    dim = spark.createDataFrame([], _EMPTY_DIM_DDL)
    dim = scd2_apply_snapshot(dim, _snap(spark, [(2, "X")]), ["user_id"], ["state"], t1)
    dim = scd2_apply_snapshot(dim, _snap(spark, []), ["user_id"], ["state"], t2)  # delete
    inside = spark.createDataFrame(
        [(2, "Y", _ts("2024-01-15 00:00:00"), 1)],
        "user_id int, state string, ts timestamp, eid int",
    )
    with pytest.raises(ValueError, match="predate"):
        scd2_apply(dim, inside, ["user_id"], ["state"], "ts", ["eid"])
    # at-or-after the closing timestamp is fine and continues numbering
    after = spark.createDataFrame(
        [(2, "Y", _ts("2024-03-01 00:00:00"), 1)],
        "user_id int, state string, ts timestamp, eid int",
    )
    got = {r.version: r for r in scd2_apply(dim, after, ["user_id"], ["state"], "ts", ["eid"]).collect()}
    assert got[2].is_current and got[2].valid_from == _ts("2024-03-01 00:00:00")


def test_scd2_apply_snapshot_rejects_early_as_of_on_delete(spark):
    """Round-8 review: deleted keys never enter the change batch, so the
    apply-side validation could not see an as_of that predates a closing
    key's open valid_from — the snapshot operator checks it itself
    (round 10: folded into the ONE ordering-bound count over the
    batch-sized stats frame, same rejection)."""
    t2 = _ts("2024-02-01 00:00:00")
    dim = spark.createDataFrame([], _EMPTY_DIM_DDL)
    dim = scd2_apply_snapshot(dim, _snap(spark, [(1, "A")]), ["user_id"], ["state"], t2)
    with pytest.raises(ValueError, match="predates the ordering bound"):
        scd2_apply_snapshot(
            dim, _snap(spark, []), ["user_id"], ["state"], _ts("2024-01-01 00:00:00")
        )
    # validate=False takes the best-effort path (documented escape hatch)
    forced = scd2_apply_snapshot(
        dim, _snap(spark, []), ["user_id"], ["state"],
        _ts("2024-01-01 00:00:00"), validate=False,
    ).collect()
    assert not forced[0].is_current
