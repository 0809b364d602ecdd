"""DAG semantics tests (mirrors reference tests/test_dag.py cases)."""

import pytest

from sayn_spark.plans.dag import (
    DagError,
    downstream,
    query_dag,
    ready_sets,
    topological_sort,
    upstream,
    validate_dag,
)

DAG = {
    "a": [],
    "b": ["a"],
    "c": ["a"],
    "d": ["b", "c"],
    "e": ["d"],
    "f": [],
}


def test_validate_ok():
    validate_dag(DAG)


def test_missing_parent():
    with pytest.raises(DagError, match="missing parents"):
        validate_dag({"a": ["ghost"]})


def test_cycle():
    with pytest.raises(DagError, match="cycle"):
        validate_dag({"a": ["b"], "b": ["a"]})


def test_self_cycle():
    with pytest.raises(DagError, match="cycle"):
        validate_dag({"a": ["a"]})


def test_toposort_order():
    order = topological_sort(DAG)
    pos = {n: i for i, n in enumerate(order)}
    for node, parents in DAG.items():
        for p in parents:
            assert pos[p] < pos[node]


def test_upstream_downstream():
    assert upstream(DAG, "d") == {"a", "b", "c"}
    assert downstream(DAG, "a") == {"b", "c", "d", "e"}
    assert downstream(DAG, "f") == set()


def test_query_dag_include_exclude():
    inc = [{"task": "d", "upstream": True, "downstream": False}]
    exc = [{"task": "b", "upstream": False, "downstream": False}]
    assert query_dag(DAG, inc, exc) == {"a", "c", "d"}


def test_query_dag_empty_include_is_all():
    assert query_dag(DAG, [], []) == set(DAG)


def test_ready_sets_levels():
    levels = ready_sets(DAG)
    assert set(levels[0]) == {"a", "f"}
    assert set(levels[1]) == {"b", "c"}
    assert levels[2] == ["d"]
    assert levels[3] == ["e"]
