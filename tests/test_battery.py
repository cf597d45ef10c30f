"""Structural guards for the driver-contract query battery
(plans/queries.py): the round-3 battery silently outgrew the driver's
50-entry correctness window and two previously-green oracle queries
went unverified (VERDICT r3 #1). These checks make that class of
regression impossible to land quietly."""

from __future__ import annotations


def _load():
    from opennre_spark.plans import queries as Q

    return Q.queries(), Q.oracle_sql()


def test_battery_is_exactly_fifty():
    q, _ = _load()
    assert len(q) == 50


def test_oracle_bearing_queries_come_first():
    """The driver evaluates the first 50 entries; every oracle-bearing
    query must precede every rows-only one so none of the DuckDB
    cross-checks can fall outside the window."""
    q, o = _load()
    names = list(q)
    rows_only_seen = False
    for name in names:
        if name in o:
            assert not rows_only_seen, (
                f"oracle-bearing {name!r} appears after a rows-only "
                "entry — it would risk falling outside the driver window"
            )
        else:
            rows_only_seen = True


def test_no_orphan_oracles_and_all_callables():
    q, o = _load()
    assert set(o) <= set(q), f"orphan oracles: {sorted(set(o) - set(q))}"
    for name, fn in q.items():
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and sql.strip(), name
