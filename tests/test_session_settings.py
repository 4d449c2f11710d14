"""Unit tests for the shared SET/SETTINGS helpers and the session
store — the round-6 self-review regressions (quote-awareness, sweep
races, temp-name rewrite scope)."""

from __future__ import annotations

import time

from bighouse_spark.session_settings import (
    merge_settings_clause,
    normalize_set_statement,
    parse_set_statement,
)


class TestMergeSettingsClause:
    def test_settings_inside_string_literal_untouched(self):
        sql = "SELECT * FROM t WHERE msg = 'see SETTINGS docs'"
        out = merge_settings_clause(sql, {"max_execution_time": "5"})
        assert out == sql + " SETTINGS max_execution_time = 5"

    def test_existing_clause_with_quoted_comma_value(self):
        out = merge_settings_clause(
            "SELECT 1 SETTINGS x = 'a,b'", {"y": "2"}
        )
        # the quoted comma survives; session value merges alongside
        assert out == "SELECT 1 SETTINGS y = 2, x = 'a,b'"

    def test_query_clause_wins_on_conflict(self):
        out = merge_settings_clause(
            "SELECT 1 SETTINGS x = 9", {"x": "1", "z": "3"}
        )
        assert out == "SELECT 1 SETTINGS x = 9, z = 3"

    def test_settings_named_column_not_a_clause(self):
        sql = "SELECT settings FROM t"
        out = merge_settings_clause(sql, {"x": "1"})
        assert out == sql + " SETTINGS x = 1"

    def test_non_select_untouched(self):
        sql = "INSERT INTO t VALUES (1)"
        assert merge_settings_clause(sql, {"x": "1"}) == sql


class TestSetStatementParsing:
    def test_to_spelling_and_multi_pairs(self):
        assert parse_set_statement("SET a TO 1, b = 'x,y'") == {
            "a": "1", "b": "'x,y'",
        }
        assert normalize_set_statement("SET a TO 1") == "SET a = 1"
        assert parse_set_statement("SELECT 1") is None


class TestSessionStoreLifecycle:
    def test_fresh_session_is_born_alive(self, spark):
        from bighouse_spark.engine import BigHouseEngine
        from bighouse_spark.server import SessionStore

        eng = BigHouseEngine(spark)
        store = SessionStore()
        s = store.get_or_create("alive", create=True)
        assert s.expires_at > time.monotonic()
        store.sweep(eng)  # must NOT reap the fresh session
        assert store.get_or_create("alive", create=False) is s

    def test_sweep_never_reaps_a_locked_session(self, spark):
        from bighouse_spark.engine import BigHouseEngine
        from bighouse_spark.server import SessionStore

        eng = BigHouseEngine(spark)
        store = SessionStore()
        s = store.get_or_create("busy", create=True)
        s.expires_at = 0.0  # expired on paper...
        assert s.lock.acquire(blocking=False)  # ...but mid-request
        try:
            store.sweep(eng)
            assert store.get_or_create("busy", create=False) is s
        finally:
            s.lock.release()
        store.sweep(eng)  # released + expired → reaped
        assert store.get_or_create("busy", create=False) is None


class TestTempNameRewriteScope:
    def test_only_table_positions_rewrite(self):
        from bighouse_spark.server import _rewrite_names_outside_strings

        names = {"status": "bh_tmp_x_status"}
        assert (
            _rewrite_names_outside_strings(
                "SELECT status FROM events", names
            )
            == "SELECT status FROM events"  # column untouched
        )
        assert (
            _rewrite_names_outside_strings(
                "SELECT * FROM status JOIN status", names
            )
            == "SELECT * FROM bh_tmp_x_status JOIN bh_tmp_x_status"
        )
        assert (
            _rewrite_names_outside_strings(
                "INSERT INTO status VALUES (1)", names
            )
            == "INSERT INTO bh_tmp_x_status VALUES (1)"
        )
        assert (
            _rewrite_names_outside_strings(
                "SELECT 'from status' AS s", names
            )
            == "SELECT 'from status' AS s"  # literal untouched
        )


class TestTempNameRewriteScope2:
    def test_comma_from_list_and_case_sensitivity(self):
        from bighouse_spark.server import _rewrite_names_outside_strings

        names = {"status": "bh_tmp_x_status"}
        # CH cross-join comma spelling rewrites...
        assert (
            _rewrite_names_outside_strings(
                "SELECT * FROM events, status WHERE x = 1", names
            )
            == "SELECT * FROM events, bh_tmp_x_status WHERE x = 1"
        )
        # ...but select-list commas do not.
        assert (
            _rewrite_names_outside_strings(
                "SELECT a, status FROM events", names
            )
            == "SELECT a, status FROM events"
        )
        # CH identifiers are case-sensitive: STATUS is another table.
        assert (
            _rewrite_names_outside_strings(
                "SELECT * FROM STATUS", names
            )
            == "SELECT * FROM STATUS"
        )
        assert (
            _rewrite_names_outside_strings(
                "TRUNCATE TABLE status", names
            )
            == "TRUNCATE TABLE bh_tmp_x_status"
        )
