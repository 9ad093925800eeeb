"""The driver verifies only a 50-query prefix of queries() — these
invariants keep that prefix meaningful (VERDICT.md r03 item 5)."""

from __future__ import annotations

from spark_sql_custom_mq_datasource_spark.plans.registry import (
    _PRIORITY,
    QUERIES,
    get_oracles,
    get_queries,
)


def test_priority_names_all_registered():
    get_queries()
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_prefix_is_exactly_priority():
    names = list(get_queries())
    assert names[: len(_PRIORITY)] == list(_PRIORITY)
    assert len(_PRIORITY) == 50


def test_prefix_queries_all_have_oracles():
    """Everything in the checked prefix is value-checkable — including the
    mq wordcount, whose oracle is a VALUES literal recomputed from the
    deterministic payload generator (VERDICT.md r04 item 2)."""
    oracles = get_oracles()
    no_oracle = [n for n in _PRIORITY if n not in oracles]
    assert no_oracle == [], no_oracle


def test_registered_fn_names_match_registry_keys():
    """A @register decorator must sit directly on the query it names —
    inserting a helper def between the decorator and the query silently
    registers the HELPER as the query's fn (caught live in round 17:
    q_ann_ivf_pq_persisted briefly resolved to pq_probe_tables)."""
    get_queries()
    bad = [
        (n, q.fn.__name__)
        for n, q in QUERIES.items()
        if q.fn.__name__ != n
    ]
    assert bad == [], bad
