"""Task query grammar tests (mirrors reference tests/test_task_query.py)."""

import pytest

from sayn_spark.plans.task_query import TaskQueryError, get_query, get_query_component

TASKS = {
    "t1": {"group": "g1", "tags": ["x"]},
    "t2": {"group": "g1", "tags": []},
    "t3": {"group": "g2", "tags": ["x", "y"]},
}


def test_plain_task():
    assert get_query_component(TASKS, "t1") == [
        {"task": "t1", "upstream": False, "downstream": False}
    ]


def test_upstream_downstream_markers():
    assert get_query_component(TASKS, "+t1")[0]["upstream"]
    assert get_query_component(TASKS, "t1+")[0]["downstream"]
    op = get_query_component(TASKS, "+t1+")[0]
    assert op["upstream"] and op["downstream"]


def test_group_and_tag():
    assert {op["task"] for op in get_query_component(TASKS, "group:g1")} == {"t1", "t2"}
    assert {op["task"] for op in get_query_component(TASKS, "tag:x")} == {"t1", "t3"}


def test_undefined():
    with pytest.raises(TaskQueryError, match="undefined task"):
        get_query_component(TASKS, "nope")
    with pytest.raises(TaskQueryError, match="undefined group"):
        get_query_component(TASKS, "group:nope")
    with pytest.raises(TaskQueryError, match="undefined tag"):
        get_query_component(TASKS, "tag:nope")


def test_bad_syntax():
    for bad in ["group:", "tag:", "++t1", "t1++", "a b"]:
        with pytest.raises(TaskQueryError):
            get_query_component(TASKS, bad)


def test_get_query_dedupes_and_merges_flags():
    inc, exc = get_query(TASKS, include=["+t1", "t1+"], exclude=["t2"])
    assert inc == [{"task": "t1", "upstream": True, "downstream": True}]
    assert exc == [{"task": "t2", "upstream": False, "downstream": False}]
