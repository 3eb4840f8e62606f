"""Golden SCD2 tests mirroring the reference's end-to-end temporal
scenario suite (tests/test_temporal_scenarios.py:164-233):

1. the 8-scenario change-detection matrix (user deactivated, two
   ownership transfers, name change, deal stage→closedwon, new
   contact, soft delete, new association), and
2. the idempotency golden rule: re-running the same snapshot yields
   zero changes (docs/TESTING_QUICK_REFERENCE.md:16-35).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.scd2 import (
    IMMUTABLE_EDGE_TYPES,
    classify_changes,
    diff_edges,
    scd2_merge,
    with_temporal_fields,
)

T0, T1 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"

BASELINE = [
    # (hubspot_id, name, owner_id, stage, active)
    ("u1", "Olivia Owner", "", "", True),
    ("u2", "Oscar Old", "", "", True),
    ("c1", "John Doe", "u1", "lead", True),
    ("c2", "Jane Roe", "u1", "customer", True),
    ("c3", "Jim Poe", "u2", "lead", True),
    ("d1", "Big Deal", "u1", "negotiation", True),
]

MODIFIED = [
    ("u1", "Olivia Owner", "", "", True),
    ("u2", "Oscar Old", "", "", False),  # scenario 1: user deactivated
    ("c1", "John Doe", "u2", "lead", True),  # scenario 2: ownership transfer
    ("c2", "Jane Smith", "u1", "customer", True),  # scenario 4: name change
    # c3 missing → scenario 7: soft delete
    ("c4", "Nina New", "u1", "subscriber", True),  # scenario 6: new contact
    ("d1", "Big Deal", "u2", "closedwon", True),  # 3: transfer + 5: stage change
]

COLS = ["hubspot_id", "name", "owner_id", "stage", "active"]


@pytest.fixture(scope="module")
def merged(spark):
    current = with_temporal_fields(spark.createDataFrame(BASELINE, COLS), T0)
    incoming = spark.createDataFrame(MODIFIED, COLS)
    return scd2_merge(current, incoming, key="hubspot_id", now=T1)


def test_eight_scenarios_detected(merged):
    log = {r["hubspot_id"]: r["change_type"] for r in merged.changelog.collect()}
    assert log == {
        "u2": "updated",  # deactivated
        "c1": "updated",  # ownership transfer
        "c2": "updated",  # name change
        "d1": "updated",  # transfer + stage→closedwon
        "c3": "deleted",  # soft delete
        "c4": "new",  # new contact
    }
    # u1 unchanged → absent from changelog
    assert "u1" not in log


def test_history_closes_old_versions(merged):
    hist = {r["hubspot_id"]: r for r in merged.history.collect()}
    assert set(hist) == {"u2", "c1", "c2", "d1", "c3"}
    for r in hist.values():
        assert str(r["valid_to"]).startswith("2024-02-01")
        assert r["is_current"] is False
    assert hist["c1"]["owner_id"] == "u1"  # history keeps the OLD owner
    assert hist["d1"]["stage"] == "negotiation"


def test_new_current_state(merged):
    cur = {r["hubspot_id"]: r for r in merged.current.collect()}
    assert len(cur) == 7  # 5 live from incoming + c4 new? (6 incoming) + c3 deleted
    live = {k: r for k, r in cur.items() if r["is_current"] and not r["is_deleted"]}
    assert set(live) == {"u1", "u2", "c1", "c2", "c4", "d1"}
    assert live["c1"]["owner_id"] == "u2"  # new owner
    assert live["d1"]["stage"] == "closedwon"
    assert str(live["c4"]["valid_from"]).startswith("2024-02-01")
    assert str(live["u1"]["valid_from"]).startswith("2024-01-01")  # untouched
    # soft-deleted row kept, flagged (T4)
    c3 = cur["c3"]
    assert c3["is_deleted"] is True and c3["is_current"] is False
    assert str(c3["valid_to"]).startswith("2024-02-01")


def test_idempotent_rerun_zero_changes(spark, merged):
    incoming = spark.createDataFrame(MODIFIED, COLS)
    rerun = scd2_merge(merged.current, incoming, key="hubspot_id", now="2024-03-01 00:00:00")
    assert rerun.changelog.count() == 0  # golden rule
    assert rerun.history.count() == 0
    # state is stable
    assert rerun.current.count() == merged.current.count()


def test_soft_delete_guard_not_redeleted(spark, merged):
    """c3 stays missing on the next run; already-deleted rows are not
    re-processed (temporal_loader.py:245 guard)."""
    incoming = spark.createDataFrame(MODIFIED, COLS)
    rerun = scd2_merge(merged.current, incoming, key="hubspot_id", now="2024-03-01 00:00:00")
    c3 = [r for r in rerun.current.collect() if r["hubspot_id"] == "c3"]
    assert len(c3) == 1
    assert str(c3[0]["valid_to"]).startswith("2024-02-01")  # original delete time kept


def test_classify_ignores_last_modified(spark):
    cur = with_temporal_fields(
        spark.createDataFrame([("a", "v", "2024-01-01")], ["hubspot_id", "x", "last_modified"]),
        T0,
    )
    inc = spark.createDataFrame([("a", "v", "2099-12-31")], ["hubspot_id", "x", "last_modified"])
    out = classify_changes(cur, inc, "hubspot_id").collect()
    assert out[0]["change_type"] == "unchanged"  # last_modified excluded from hash


EDGES_OLD = [
    ("OWNED_BY", "c1", "u1"),
    ("OWNED_BY", "c3", "u2"),
    ("BELONGS_TO", "d1", "co1"),
    ("PERFORMED", "c1", "ev1"),  # immutable
]
EDGES_NEW = [
    ("OWNED_BY", "c1", "u2"),  # changed owner: remove old, add new
    ("BELONGS_TO", "d1", "co1"),  # unchanged
    ("ASSOCIATED_WITH", "c4", "d1"),  # scenario 8: new association
    ("PERFORMED", "c1", "ev2"),  # immutable: appended, never diffed
]
ECOLS = ["rel_type", "from_id", "to_id"]


def test_edge_diff_and_immutable_bypass(spark):
    old = spark.createDataFrame(EDGES_OLD, ECOLS)
    new = spark.createDataFrame(EDGES_NEW, ECOLS)
    res = diff_edges(old, new, now=T1)
    log = {(r["rel_type"], r["from_id"], r["to_id"]): r["change_type"] for r in res.changelog.collect()}
    assert log == {
        ("OWNED_BY", "c1", "u2"): "added",
        ("ASSOCIATED_WITH", "c4", "d1"): "added",
        ("OWNED_BY", "c1", "u1"): "removed",
        ("OWNED_BY", "c3", "u2"): "removed",
    }
    assert res.immutable.count() == 1  # PERFORMED bypasses tracking (T7)
    assert "PERFORMED" not in {r["rel_type"] for r in res.changelog.collect()}


def test_edge_diff_idempotent(spark):
    new = spark.createDataFrame(EDGES_NEW, ECOLS)
    res = diff_edges(new, new, now=T1)
    assert res.changelog.count() == 0


def test_immutable_set_matches_reference():
    assert IMMUTABLE_EDGE_TYPES == {
        "PERFORMED", "SUBMITTED_BY", "ON_PAGE", "FOR_CAMPAIGN", "CLICKED_URL", "VISITED",
    }


def test_materialize_outputs_identical(spark):
    """materialize=True (one-pass localCheckpoint for all-outputs
    consumers) must produce bit-identical current/history/changelog."""
    current = with_temporal_fields(spark.createDataFrame(BASELINE, COLS), T0)
    incoming = spark.createDataFrame(MODIFIED, COLS)
    lazy = scd2_merge(current, incoming, key="hubspot_id", now=T1)
    eager = scd2_merge(
        current, incoming, key="hubspot_id", now=T1, materialize=True
    )
    for name in ("current", "history", "changelog"):
        a = sorted(map(tuple, getattr(lazy, name).collect()))
        b = sorted(map(tuple, getattr(eager, name).collect()))
        assert a == b, f"{name} differs under materialize=True"
