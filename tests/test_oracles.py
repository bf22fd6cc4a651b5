"""Spark-free oracle-registry invariants (fast, no session)."""

import pytest

from big_data_hdfs_ray_vs_spark_spark import oracles, queries


def test_every_oracle_has_a_query():
    q = queries.all_queries()
    o = oracles.all_oracles()
    assert set(o) <= set(q), set(o) - set(q)


def test_events_guard_rewrites_table_refs():
    guarded = oracles._guard_events("SELECT user_id FROM events")
    assert "__events" in guarded
    assert "WITH" in guarded.upper()


def test_events_literal_fails_loudly():
    """_guard_events rewrites every \\bevents\\b token including those
    inside string literals; all_oracles() must reject such an oracle at
    registration rather than ship a silently corrupted value."""
    bad = "SELECT 'events' AS label, count(*) AS n FROM events"
    with pytest.raises(AssertionError, match="string literal"):
        oracles._assert_no_events_literal("q_test", bad)
    # escaped-quote form is still scanned as one literal
    bad2 = "SELECT 'it''s events' AS label FROM events"
    with pytest.raises(AssertionError):
        oracles._assert_no_events_literal("q_test", bad2)
    # benign literals pass
    oracles._assert_no_events_literal(
        "q_test", "SELECT 'eventful' AS label FROM events"
    )


def test_all_oracles_applies_literal_guard_to_guarded_entries_only():
    out = oracles.all_oracles()
    for name, sql in out.items():
        # any guarded oracle carries the full guard CTE verbatim
        if "__events" in sql:
            assert oracles._EVENTS_GUARD in sql, name


def test_table_guards_cover_documents_and_embeddings():
    """Every oracle referencing a guarded base table is rewritten to
    its shadow CTE (identity-null rows rejected on the oracle side,
    mirroring sources/registry.load_table)."""
    out = oracles.all_oracles()
    for name, sql in out.items():
        for t in ("events", "documents", "embeddings"):
            body = oracles._TABLE_GUARDS[t]
            stripped = sql.replace(body, "")
            # outside the guard body, only __aliased references remain
            assert not oracles._TABLE_REFS[t].search(stripped), (name, t)


def test_guard_tables_multi():
    sql = "SELECT * FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id"
    guarded = oracles._guard_tables(sql, ["documents", "embeddings"])
    assert "__documents" in guarded and "__embeddings" in guarded
    assert guarded.count("WITH") == 1
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT 1 AS doc_id, 'x' AS text")
    con.sql("CREATE VIEW embeddings AS SELECT 1 AS vec_id, [1.0] AS embedding")
    assert con.sql(guarded).fetchall() == [(1, "x", 1, [1.0])]


def test_literal_lexer_handles_comments_and_adjacent_literals():
    """The literal scanner must not (a) open a phantom literal at an
    apostrophe inside a -- comment, (b) merge two separate literals
    across an intervening '' via greedy backtracking, or (c) end a
    literal at a -- inside it."""
    assert oracles._sql_literals("-- it's a comment\nSELECT 'ok' FROM t") == ["'ok'"]
    assert oracles._sql_literals("SELECT '\\s+', x, '' , 'b' FROM t") == [
        "'\\s+'",
        "''",
        "'b'",
    ]
    assert oracles._sql_literals("SELECT 'a--b' FROM t -- trail") == ["'a--b'"]
    assert oracles._sql_literals("SELECT 'it''s events' FROM t") == ["'it''s events'"]
