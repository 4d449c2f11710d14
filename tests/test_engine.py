"""Engine lifecycle tests: the QueryExecutor-analog surface
(execute → {cols, rows}, init queries, sink, query_log, health)."""

from __future__ import annotations

import pytest

from bighouse_spark.engine import BigHouseEngine, QueryRequest
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def engine(spark):
    return BigHouseEngine(spark)


def test_execute_returns_cols_rows(engine):
    out = engine.execute("SELECT 1 AS a, 'x' AS b")
    assert out.cols == ["a", "b"]
    assert out.rows == [[1, "x"]]
    assert out.elapsed_sec > 0


def test_execute_ch_dialect_table_function(engine, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("k,v\n1,10\n2,20\n1,30\n")
    out = engine.execute(
        f"SELECT k, sum(v) AS s FROM file('file://{p}', 'CSVWithNames', "
        "'k UInt32, v Int64') GROUP BY k ORDER BY k"
    )
    assert out.cols == ["k", "s"]
    assert out.rows == [[1, 40], [2, 20]]


def test_init_queries_run_first(engine, spark):
    from bighouse_spark.sources.catalog import load_table

    load_table(spark, SF_CORRECT, "region").createOrReplaceTempView(
        "__eng_region"
    )
    req = QueryRequest(
        query="SELECT count(*) AS c FROM __eng_region_view",
        init_queries=[
            "CREATE OR REPLACE TEMPORARY VIEW __eng_region_view AS "
            "SELECT * FROM __eng_region WHERE r_regionkey < 3"
        ],
    )
    out = engine.execute(req)
    assert out.rows == [[3]]


def test_cluster_shape_maps_to_partitions(engine, spark):
    # The knob applies DURING the query (visible via SQL SET output)
    # and is restored afterwards — session conf is shared across the
    # server's request threads, so leaks would cross-contaminate.
    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = engine.execute(
        QueryRequest(
            query="SET spark.sql.shuffle.partitions",
            num_nodes=3,
            cores=4,
        )
    )
    assert out.rows[0][1] == "12"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_error_lands_in_query_log(engine):
    before = len(engine.query_log)
    with pytest.raises(Exception):
        engine.execute("SELECT definitely_not_a_column FROM nonexistent_xyz")
    assert len(engine.query_log) == before + 1
    assert engine.query_log[-1].error is not None


def test_execute_to_sink_roundtrip(engine, spark, tmp_path):
    out_dir = str(tmp_path / "sink_out")
    meta = engine.execute_to_sink(
        "SELECT 42 AS answer, 'hi' AS note", out_dir
    )
    assert meta["cols"] == ["answer", "note"]
    back = spark.read.parquet(out_dir).collect()
    assert [list(r) for r in back] == [[42, "hi"]]


def test_execute_to_sink_partitioned(engine, spark, tmp_path):
    from bighouse_spark.sources.catalog import load_table

    load_table(spark, SF_CORRECT, "orders").createOrReplaceTempView(
        "__eng_orders"
    )
    out_dir = str(tmp_path / "sink_part")
    engine.execute_to_sink(
        "SELECT o_orderkey, o_orderstatus FROM __eng_orders",
        out_dir,
        partition_by=["o_orderstatus"],
    )
    # Partition pruning must reach the file listing.
    pruned = spark.read.parquet(out_dir).where("o_orderstatus = 'F'")
    import os

    assert any(
        d.startswith("o_orderstatus=") for d in os.listdir(out_dir)
        if not d.startswith("_")
    )
    assert pruned.count() > 0


def test_health_check(engine):
    assert engine.health_check() is True


def test_result_cache_opt_in(engine):
    engine.clear_cache()
    q = "SELECT 1 + 1 AS two SETTINGS use_query_cache=1"
    r1 = engine.execute(q)
    r2 = engine.execute(q)
    assert r1.rows == r2.rows == [[2]]
    assert engine.query_log[-1].cached is True
    assert engine.query_log[-2].cached is False
    # Without the setting, no cache involvement.
    engine.execute("SELECT 1 + 1 AS two")
    assert engine.query_log[-1].cached is False
    engine.clear_cache()
    engine.execute(q)
    assert engine.query_log[-1].cached is False


def test_result_cache_lru_eviction(engine):
    engine.clear_cache()
    old_entries = type(engine).CACHE_MAX_ENTRIES
    type(engine).CACHE_MAX_ENTRIES = 3
    try:
        qs = [
            f"SELECT {i} AS v SETTINGS use_query_cache=1" for i in range(5)
        ]
        for q in qs:
            engine.execute(q)
        assert len(engine._result_cache) == 3
        # Oldest two evicted -> re-running them is a miss.
        engine.execute(qs[0])
        assert engine.query_log[-1].cached is False
        # Most recent still cached.
        engine.execute(qs[4])
        assert engine.query_log[-1].cached is True
    finally:
        type(engine).CACHE_MAX_ENTRIES = old_entries
        engine.clear_cache()


def test_table_function_views_dropped_and_unique(engine, spark, tmp_path):
    import csv as _csv

    p = tmp_path / "vu.csv"
    with open(p, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["a", "b"])
        w.writerows([[1, 2], [3, 4]])
    q = (
        f"SELECT count() AS c FROM file('{p}', 'CSVWithNames', "
        "'a UInt64, b UInt64')"
    )

    def src_views():
        return {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__bh_src_")
        }

    # Single-use source views must not accrete in the session catalog
    # (and per-query unique names mean concurrent requests can't read
    # each other's sources). Relative check: transpile-only tests
    # elsewhere register views without an engine to clean them up.
    before = src_views()
    engine.execute(q)
    engine.execute(q)
    assert src_views() == before


def test_system_clusters_and_profile_views(engine, spark):
    engine.execute("SELECT 1 AS x")
    engine.refresh_system_views()
    clusters = spark.sql(
        "SELECT cluster_name, host_name FROM system_clusters"
    ).collect()
    assert len(clusters) >= 1
    assert clusters[0].cluster_name == "bighouse"
    prof = spark.sql("SELECT * FROM system_profile").collect()[0]
    assert prof.queries_executed >= 1
    assert prof.total_elapsed_sec > 0
    # CH's column shape: name/value/changed/description (the Spark
    # confs ride along under their own names, changed = 0).
    settings = spark.sql(
        "SELECT value FROM system_settings "
        "WHERE name = 'spark.sql.shuffle.partitions'"
    ).collect()
    assert len(settings) == 1
    ch_named = spark.sql(
        "SELECT name, value, changed FROM system_settings "
        "WHERE name = 'max_result_rows'"
    ).collect()
    assert len(ch_named) == 1 and ch_named[0].changed in (0, 1)


def test_insert_into_attached_table(engine, spark, tmp_path):
    """CH INSERT INTO <table> against ATTACHed storage: positional
    columns, append to backing files, view refreshed, cache cleared."""
    d = str(tmp_path / "ins_tbl")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).write.parquet(d)
    engine.attach_table("ins_tbl", d)
    assert engine.execute("SELECT count() AS n FROM ins_tbl").rows == [[2]]
    engine.execute("INSERT INTO ins_tbl SELECT 3 AS x, 'c' AS y")
    engine.execute("INSERT INTO ins_tbl VALUES (4, 'd'), (5, 'e')")
    out = engine.execute(
        "SELECT count() AS n, max(id) AS m FROM ins_tbl"
    )
    assert out.rows == [[5, 5]]
    with pytest.raises(ValueError, match="not an attached table"):
        engine.execute("INSERT INTO never_attached SELECT 1")
    with pytest.raises(ValueError, match="column"):
        engine.execute("INSERT INTO ins_tbl SELECT 1 AS only_one")


def test_mutations_on_attached_table(engine, spark, tmp_path):
    """CH mutation surface: ALTER DELETE / ALTER UPDATE / TRUNCATE
    rewrite the backing storage; DROP detaches without deleting."""
    d = str(tmp_path / "mut_tbl")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], ["id", "v"]
    ).write.parquet(d)
    engine.attach_table("mut_tbl", d)
    engine.execute("ALTER TABLE mut_tbl DELETE WHERE id >= 7")
    assert engine.execute(
        "SELECT count() AS n, max(id) AS m FROM mut_tbl"
    ).rows == [[7, 6]]
    engine.execute("ALTER TABLE mut_tbl UPDATE v = v * 10 WHERE id = 1")
    assert engine.execute(
        "SELECT CAST(sum(v) AS INT) AS s FROM mut_tbl"
    ).rows == [[30]]  # 0+10+2+3+4+5+6
    engine.execute("TRUNCATE TABLE mut_tbl")
    assert engine.execute("SELECT count() AS n FROM mut_tbl").rows == [[0]]
    engine.execute("INSERT INTO mut_tbl VALUES (1, 2.0)")
    assert engine.execute("SELECT count() AS n FROM mut_tbl").rows == [[1]]
    engine.execute("DROP TABLE mut_tbl")
    import os

    assert os.path.exists(d)  # DROP detaches; shared storage kept
    with pytest.raises(Exception):
        engine.execute("SELECT count() FROM mut_tbl")


def test_dictionary_lookups(engine):
    """CH dictionaries: CREATE DICTIONARY over an attached table,
    dictGet/dictHas/dictGetOrDefault rewrite to correlated scalar
    subqueries (→ a broadcast lookup join under Catalyst)."""
    engine.attach_table("nation_d", f"{SF_CORRECT}/nation.parquet")
    engine.execute(
        "CREATE DICTIONARY nations (n_nationkey UInt64, n_name String) "
        "PRIMARY KEY n_nationkey "
        "SOURCE(CLICKHOUSE(TABLE 'nation_d')) "
        "LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 1000)"
    )
    out = engine.execute(
        "SELECT dictGetString('nations', 'n_name', 3) AS name, "
        "dictHas('nations', 3) AS has3, "
        "dictHas('nations', 9999) AS has_none, "
        "dictGetOrDefault('nations', 'n_name', 9999, 'missing') AS dflt"
    )
    assert out.rows[0][1] is True and out.rows[0][2] is False
    assert out.rows[0][3] == "missing"
    assert isinstance(out.rows[0][0], str) and out.rows[0][0]
    # enrichment over a fact table (the CH dictionary join shape)
    engine.attach_table("supplier_d", f"{SF_CORRECT}/supplier.parquet")
    out = engine.execute(
        "SELECT dictGet('nations', 'n_name', s_nationkey) AS nation, "
        "count() AS n FROM supplier_d GROUP BY nation ORDER BY n DESC, "
        "nation LIMIT 3"
    )
    assert len(out.rows) == 3 and all(r[0] for r in out.rows)
    assert engine.execute("SHOW DICTIONARIES").rows == [["nations"]]
    engine.refresh_system_views()
    assert engine.execute(
        "SELECT source, key FROM system_dictionaries WHERE name = 'nations'"
    ).rows == [["nation_d", "n_nationkey"]]
    with pytest.raises(ValueError, match="no dictionary"):
        engine.execute("SELECT dictGet('ghost', 'x', 1)")
    # upper/mixed-case spellings hit the same rewrite — the early-exit
    # guard is case-insensitive like the pattern it guards (ADVICE r2)
    up = engine.execute(
        "SELECT DICTGETSTRING('nations', 'n_name', 3) AS name, "
        "DictHas('nations', 3) AS has3"
    )
    assert isinstance(up.rows[0][0], str) and up.rows[0][1] is True
    engine.execute("DROP DICTIONARY nations")
    with pytest.raises(Exception):
        engine.execute("SELECT dictGet('nations', 'n_name', 3)")


def test_insert_format_payloads(engine):
    """CH wire-style INSERT ... FORMAT <fmt> <payload>: JSONEachRow by
    name, Values/CSV/TSV positional."""
    engine.execute("CREATE TABLE wires (id UInt32, name String, v Float64)")
    engine.execute(
        "INSERT INTO wires FORMAT Values (1, 'a', 1.5), (2, 'b', 2.5)"
    )
    engine.execute(
        'INSERT INTO wires FORMAT JSONEachRow\n'
        '{"name": "c", "id": 3, "v": 3.5}\n{"id": 4, "name": "d", "v": 4.5}'
    )
    engine.execute("INSERT INTO wires FORMAT CSV\n5,e,5.5\n6,f,6.5")
    engine.execute("INSERT INTO wires FORMAT TSV\n7\tg\t7.5")
    out = engine.execute(
        "SELECT id, name, CAST(v * 10 AS INT) AS v10 FROM wires ORDER BY id"
    )
    assert out.rows == [
        [1, "a", 15], [2, "b", 25], [3, "c", 35], [4, "d", 45],
        [5, "e", 55], [6, "f", 65], [7, "g", 75],
    ]
    with pytest.raises(ValueError, match="not an attached"):
        engine.execute("INSERT INTO ghost FORMAT CSV\n1")


def test_create_table_full_write_surface(engine):
    """CREATE TABLE materializes an engine-owned parquet dir; the
    whole write surface then composes: INSERT, mutation, OPTIMIZE,
    materialized view, system_parts."""
    engine.execute(
        "CREATE TABLE metrics (name String, v Decimal(20, 4), n UInt32) "
        "ENGINE = MergeTree() ORDER BY (name) SETTINGS index_granularity=8192"
    )
    assert engine.execute("SELECT count() AS c FROM metrics").rows == [[0]]
    engine.execute("INSERT INTO metrics VALUES ('a', 1.5, 2), ('b', 2.0, 3)")
    engine.execute(
        "CREATE MATERIALIZED VIEW metrics_sum AS "
        "SELECT name, sum(n) AS total FROM metrics GROUP BY name"
    )
    engine.execute("INSERT INTO metrics VALUES ('a', 9.0, 10)")
    out = engine.execute(
        "SELECT name, total FROM metrics_sum ORDER BY name"
    )
    assert out.rows == [["a", 12], ["b", 3]]
    engine.execute("ALTER TABLE metrics DELETE WHERE name = 'b'")
    assert engine.execute("SELECT count() AS c FROM metrics").rows == [[2]]
    engine.execute("OPTIMIZE TABLE metrics FINAL")
    # IF NOT EXISTS no-op; duplicate without it raises
    engine.execute("CREATE TABLE IF NOT EXISTS metrics (x UInt8)")
    with pytest.raises(ValueError, match="name in use"):
        engine.execute("CREATE TABLE metrics (x UInt8)")
    with pytest.raises(ValueError, match="unsupported trailing"):
        engine.execute("CREATE TABLE weird (x UInt8) AS SELECT 1")


def test_alter_column_ddl(engine, spark, tmp_path):
    """CH column DDL (ADD/DROP/RENAME/MODIFY COLUMN) as eager storage
    rewrites: every backing file always matches the table schema."""
    d = str(tmp_path / "coltbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "v"]
    ).write.parquet(d)
    engine.attach_table("coltbl", d)
    engine.execute(
        "ALTER TABLE coltbl ADD COLUMN score Float64 DEFAULT id * 10"
    )
    out = engine.execute("SELECT id, v, score FROM coltbl ORDER BY id")
    assert out.rows == [[1, "a", 10.0], [2, "b", 20.0]]
    # new column participates in INSERT positionally
    engine.execute("INSERT INTO coltbl VALUES (3, 'c', 7.5)")
    engine.execute("ALTER TABLE coltbl RENAME COLUMN v TO label")
    engine.execute("ALTER TABLE coltbl MODIFY COLUMN score Int32")
    out = engine.execute("SELECT id, label, score FROM coltbl ORDER BY id")
    assert out.rows == [[1, "a", 10], [2, "b", 20], [3, "c", 7]]
    engine.execute("ALTER TABLE coltbl DROP COLUMN label")
    assert engine.execute("SELECT * FROM coltbl ORDER BY id").cols == [
        "id", "score"
    ]
    with pytest.raises(ValueError, match="no such column"):
        engine.execute("ALTER TABLE coltbl DROP COLUMN ghost")
    with pytest.raises(ValueError, match="need a type"):
        engine.execute("ALTER TABLE coltbl ADD COLUMN broken")


def test_system_parts_view(engine, spark, tmp_path):
    """system.parts analog: one row per backing file with footer row
    counts; reflects compaction after OPTIMIZE."""
    d = str(tmp_path / "parts_tbl")
    spark.createDataFrame(
        [(i,) for i in range(40)], ["id"]
    ).repartition(4).write.parquet(d)
    engine.attach_table("parts_tbl", d)
    engine.refresh_system_views()
    out = engine.execute(
        "SELECT count() AS files, sum(rows) AS total_rows FROM system_parts "
        "WHERE table = 'parts_tbl'"
    )
    assert out.rows == [[4, 40]]
    engine.execute("OPTIMIZE TABLE parts_tbl FINAL")
    engine.refresh_system_views()
    out = engine.execute(
        "SELECT count() AS files, sum(rows) AS total_rows FROM system_parts "
        "WHERE table = 'parts_tbl'"
    )
    assert out.rows == [[1, 40]]


def test_optimize_table_compaction(engine, spark, tmp_path):
    """OPTIMIZE TABLE = CH part-merge → small-file compaction: many
    tiny files in, ~target-size files out, identical contents;
    DEDUPLICATE additionally drops exact duplicate rows."""
    import glob

    d = str(tmp_path / "opt_tbl")
    spark.createDataFrame(
        [(i, f"v{i % 5}") for i in range(100)], ["id", "v"]
    ).repartition(20).write.parquet(d)
    engine.attach_table("opt_tbl", d)
    assert len(glob.glob(f"{d}/*.parquet")) == 20
    before = sorted(
        tuple(r) for r in engine.execute("SELECT * FROM opt_tbl").rows
    )
    out = engine.execute("OPTIMIZE TABLE opt_tbl FINAL")
    assert out.cols == ["path", "files_before", "files_after"]
    assert out.rows[0][1] == 20
    assert out.rows[0][2] == 1  # tiny table → one ~target-size file
    assert len(glob.glob(f"{d}/*.parquet")) == 1
    after = sorted(
        tuple(r) for r in engine.execute("SELECT * FROM opt_tbl").rows
    )
    assert before == after
    # DEDUPLICATE: duplicate every row, optimize away the copies.
    engine.execute("INSERT INTO opt_tbl SELECT * FROM opt_tbl")
    assert engine.execute("SELECT count() AS n FROM opt_tbl").rows == [[200]]
    engine.execute("OPTIMIZE TABLE opt_tbl FINAL DEDUPLICATE")
    assert engine.execute("SELECT count() AS n FROM opt_tbl").rows == [[100]]
    with pytest.raises(ValueError, match="not an attached table"):
        engine.execute("OPTIMIZE TABLE never_attached")


def test_materialized_view_incremental(engine, spark, tmp_path):
    """CH CREATE MATERIALIZED VIEW: insert-triggered incremental
    aggregate. Backfill on create, INSERT into the source refreshes
    the view by folding ONLY the new files into checkpointed state."""
    d = str(tmp_path / "mv_src")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], ["k", "v"]
    ).write.parquet(d)
    engine.attach_table("mv_src", d)
    engine.execute(
        "CREATE MATERIALIZED VIEW mv_sums POPULATE AS "
        "SELECT k, sum(v) AS s FROM mv_src GROUP BY k"
    )
    out = engine.execute("SELECT k, s FROM mv_sums ORDER BY k")
    assert out.rows == [["a", 4], ["b", 2]]
    # Insert triggers incremental refresh (checkpoint has already seen
    # the original files; only the appended file is read).
    engine.execute("INSERT INTO mv_src VALUES ('a', 10), ('c', 7)")
    out = engine.execute("SELECT k, s FROM mv_sums ORDER BY k")
    assert out.rows == [["a", 14], ["b", 2], ["c", 7]]
    # Mutations rewrite every backing file (new names), which would
    # double-count on the next refresh — so they rebuild the MV from
    # the post-mutation table (safe divergence from CH's "mutations
    # don't propagate").
    engine.execute("ALTER TABLE mv_src DELETE WHERE k = 'a'")
    out = engine.execute("SELECT k, s FROM mv_sums ORDER BY k")
    assert out.rows == [["b", 2], ["c", 7]]
    # ...and incremental refresh still works after the rebuild.
    engine.execute("INSERT INTO mv_src VALUES ('b', 5)")
    out = engine.execute("SELECT k, s FROM mv_sums ORDER BY k")
    assert out.rows == [["b", 7], ["c", 7]]
    # Non-aggregate MV → append mode.
    engine.execute(
        "CREATE MATERIALIZED VIEW mv_proj AS "
        "SELECT k, v * 2 AS v2 FROM mv_src WHERE v >= 2"
    )
    rows = engine.execute("SELECT k, v2 FROM mv_proj ORDER BY v2").rows
    assert rows == [["b", 4], ["b", 10], ["c", 14]]
    engine.execute("DROP TABLE mv_sums")
    with pytest.raises(Exception):
        engine.execute("SELECT count() FROM mv_sums")
    with pytest.raises(ValueError, match="attached table"):
        engine.execute(
            "CREATE MATERIALIZED VIEW mv_bad AS SELECT 1 AS x FROM range(3)"
        )


def test_introspection_passthrough(engine):
    """CH's SHOW TABLES / DESCRIBE / EXPLAIN surface maps straight to
    Spark SQL's own commands — the transpiler passes them through and
    the result contract (cols+rows) holds."""
    engine.attach_table("events", f"{SF_CORRECT}/events.parquet")
    tables = engine.execute("SHOW TABLES")
    assert "tableName" in tables.cols
    assert any("events" in row for row in tables.rows)
    desc = engine.execute("DESCRIBE events")
    cols = {row[0] for row in desc.rows}
    assert {"event_id", "ts", "user_id"} <= cols
    plan = engine.execute("EXPLAIN SELECT count() FROM events")
    assert plan.cols == ["plan"]
    assert "Physical Plan" in plan.rows[0][0]


def test_orc_table_function(engine, spark, tmp_path):
    p = str(tmp_path / "orc_src")
    spark.range(10).selectExpr("id AS a").write.orc(p)
    out = engine.execute(
        f"SELECT count() AS n FROM file('file://{p}/*.orc', 'ORC')"
    )
    assert out.rows == [[10]]


def test_attach_table_then_query(engine, spark):
    engine.attach_table("gh_events_like", f"{SF_CORRECT}/orders.parquet")
    out = engine.execute(
        "SELECT o_orderpriority, count() AS n FROM gh_events_like "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    assert out.cols == ["o_orderpriority", "n"]
    assert len(out.rows) == 5


def test_attach_csv_with_schema(engine, tmp_path):
    p = tmp_path / "dim.csv"
    p.write_text("code,name\n1,alpha\n2,beta\n")
    engine.attach_table(
        "dim_codes", f"file://{p}", fmt="csv", schema="code UInt32, name String"
    )
    out = engine.execute("SELECT name FROM dim_codes WHERE code = 2")
    assert out.rows == [["beta"]]


def test_system_query_log_view(engine):
    engine.execute("SELECT 1 AS one")
    engine.refresh_system_views()
    out = engine.execute(
        "SELECT count() AS n FROM system_query_log WHERE error IS NULL"
    )
    assert out.rows[0][0] >= 1
    # error rows visible too
    try:
        engine.execute("SELECT * FROM no_such_table_abc")
    except Exception:
        pass
    engine.refresh_system_views()
    out = engine.execute(
        "SELECT count() AS n FROM system_query_log WHERE error IS NOT NULL"
    )
    assert out.rows[0][0] >= 1


def test_sink_partition_pruning(engine, spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    out = str(tmp_path / "by_priority")
    engine.execute_to_sink(
        f"SELECT o_orderkey, o_orderpriority FROM "
        f"file('file://{SF_CORRECT}/orders.parquet', 'Parquet')",
        out,
        partition_by=["o_orderpriority"],
    )
    back = spark.read.parquet(out).where(
        "o_orderpriority = '1-URGENT'"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan.replace(
        "#", ""
    ) or "PartitionFilters" in plan
    # Pruned read returns only the urgent slice.
    assert back.count() == spark.read.parquet(out).where(
        "o_orderpriority = '1-URGENT'"
    ).count() > 0


def test_insert_into_function_sink(engine, tmp_path):
    out = str(tmp_path / "ins_out")
    r = engine.execute(
        f"INSERT INTO FUNCTION file('{out}', 'Parquet') "
        f"SELECT r_regionkey FROM file('file://{SF_CORRECT}/region.parquet', "
        "'Parquet')"
    )
    assert r.cols == ["path"] and r.rows == [[out]]
    back = engine.execute(
        f"SELECT count() AS n FROM file('file://{out}/*.parquet', 'Parquet')"
    )
    assert back.rows == [[5]]


def test_sink_order_by_mergetree_layout(engine, tmp_path):
    """order_by sink layout: each parquet file internally sorted with
    non-overlapping key ranges across files (MergeTree ORDER BY
    analog -> row-group min/max pruning)."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "sorted_out")
    engine.execute_to_sink(
        f"SELECT o_orderkey, o_totalprice FROM "
        f"file('file://{SF_CORRECT}/orders.parquet', 'Parquet')",
        path=out,
        order_by=["o_orderkey"],
    )
    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert files
    ranges = []
    for f in files:
        keys = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert keys == sorted(keys), f"{f} not internally sorted"
        ranges.append((keys[0], keys[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file key ranges overlap"


def test_system_tables_and_columns_views(engine):
    """system.tables / system.columns introspection analogs (B17)."""
    engine.attach_table("region", f"{SF_CORRECT}/region.parquet")
    engine.refresh_system_views()
    names = {
        r[0]
        for r in engine.execute("SELECT name FROM system_tables").rows
    }
    assert "region" in names
    cols = engine.execute(
        "SELECT name, type FROM system_columns WHERE table = 'region'"
    ).rows
    assert ["r_regionkey", "r_name"] == [c[0] for c in cols]


class TestShowCreateTable:
    def test_attached_table_renders_roundtrippable_ddl(self, spark, tmp_path):
        from bighouse_spark.dialect.schema import parse_schema_string
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        eng.execute(
            "CREATE TABLE sct_t (id UInt64, name String, score Float64, "
            "tags Array(String)) ENGINE = MergeTree ORDER BY id"
        )
        try:
            r = eng.execute("SHOW CREATE TABLE sct_t")
            assert r.cols == ["statement"]
            stmt = r.rows[0][0]
            assert stmt.startswith("CREATE TABLE sct_t")
            assert "ENGINE = MergeTree" in stmt
            body = stmt.split("(", 1)[1].rsplit(")", 1)[0].rsplit(
                "\n)", 1
            )[0]
            rt = parse_schema_string(body)
            assert [f.dataType for f in rt] == [
                f.dataType for f in spark.table("sct_t").schema
            ]
        finally:
            eng.execute("DROP TABLE sct_t")

    def test_mview_and_missing_table(self, spark, tmp_path):
        import pytest

        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        eng.execute("CREATE TABLE sct_src (k UInt64, v Float64)")
        eng.execute(
            "CREATE MATERIALIZED VIEW sct_mv AS SELECT k, sum(v) AS s "
            "FROM sct_src GROUP BY k"
        )
        try:
            stmt = eng.execute("SHOW CREATE TABLE sct_mv").rows[0][0]
            assert stmt.startswith("CREATE MATERIALIZED VIEW sct_mv")
            assert "SELECT" in stmt and "GROUP BY" in stmt
            with pytest.raises(ValueError, match="not found"):
                eng.execute("SHOW CREATE TABLE no_such_table_xyz")
            assert any(
                e.error and "not found" in e.error for e in eng.query_log
            )
        finally:
            eng.execute("DROP TABLE sct_mv")
            eng.execute("DROP TABLE sct_src")


class TestDDLSurface:
    """CTAS / CREATE VIEW / RENAME / EXCHANGE / EXISTS (round 4)."""

    def test_ctas_full_write_surface(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        eng.execute(
            "CREATE TABLE ddl_c ENGINE = MergeTree ORDER BY tuple() "
            "AS SELECT number AS n FROM numbers(3)"
        )
        try:
            assert eng.execute("SELECT sum(n) AS s FROM ddl_c").rows == [[3]]
            eng.execute("INSERT INTO ddl_c SELECT 100")
            assert eng.execute("SELECT sum(n) AS s FROM ddl_c").rows == [[103]]
            # name collision honored
            import pytest

            with pytest.raises(ValueError, match="name in use"):
                eng.execute("CREATE TABLE ddl_c AS SELECT 1 AS n")
            r = eng.execute(
                "CREATE TABLE IF NOT EXISTS ddl_c AS SELECT 1 AS n"
            )
            assert r.rows == [["ddl_c"]]
        finally:
            eng.execute("DROP TABLE ddl_c")

    def test_create_view_and_show_create(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        eng.execute("CREATE TABLE ddl_v_src (a UInt64)")
        eng.execute("INSERT INTO ddl_v_src SELECT number FROM numbers(4)")
        eng.execute("CREATE VIEW ddl_v AS SELECT a FROM ddl_v_src WHERE a > 1")
        try:
            assert eng.execute("SELECT count() AS c FROM ddl_v").rows == [[2]]
            stmt = eng.execute("SHOW CREATE TABLE ddl_v").rows[0][0]
            assert stmt.startswith("CREATE VIEW ddl_v")
            assert "WHERE a > 1" in stmt
        finally:
            eng.execute("DROP VIEW ddl_v")
            eng.execute("DROP TABLE ddl_v_src")
        assert eng.execute("EXISTS TABLE ddl_v").rows == [[0]]

    def test_rename_and_exchange(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        eng.execute("CREATE TABLE ddl_a AS SELECT 1 AS x")
        eng.execute("CREATE TABLE ddl_b AS SELECT 2 AS x UNION ALL SELECT 3")
        try:
            eng.execute("RENAME TABLE ddl_a TO ddl_a2")
            assert eng.execute("EXISTS ddl_a").rows == [[0]]
            assert eng.execute("SELECT count() AS c FROM ddl_a2").rows == [[1]]
            # writes follow the rename (attachment re-pointed)
            eng.execute("INSERT INTO ddl_a2 SELECT 9")
            assert eng.execute("SELECT count() AS c FROM ddl_a2").rows == [[2]]
            eng.execute("EXCHANGE TABLES ddl_a2 AND ddl_b")
            assert eng.execute("SELECT count() AS c FROM ddl_a2").rows == [[2]]
            assert eng.execute("SELECT count() AS c FROM ddl_b").rows == [[2]]
            # degenerate self-exchange: no-op, must NOT strand the
            # table under the 3-step swap's temp name
            eng.execute("EXCHANGE TABLES ddl_b AND ddl_b")
            assert eng.execute("SELECT count() AS c FROM ddl_b").rows == [[2]]
            # CREATE OR REPLACE drops and recreates (plain + CTAS)
            eng.execute(
                "CREATE OR REPLACE TABLE ddl_b (s String) "
                "ENGINE = Memory"
            )
            eng.execute("INSERT INTO ddl_b VALUES ('z')")
            assert eng.execute("SELECT * FROM ddl_b").rows == [["z"]]
            eng.execute(
                "CREATE OR REPLACE TABLE ddl_b ENGINE = Memory "
                "AS SELECT 5 AS a"
            )
            assert eng.execute("SELECT * FROM ddl_b").rows == [[5]]
            import pytest

            with pytest.raises(ValueError, match="exists"):
                eng.execute("RENAME TABLE ddl_b TO ddl_a2")
        finally:
            eng.execute("DROP TABLE ddl_a2")
            eng.execute("DROP TABLE ddl_b")


class TestSystemDottedSpelling:
    def test_system_tables_and_numbers(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        eng.execute("SELECT 1")
        assert eng.execute(
            "SELECT count() >= 1 AS c FROM system.query_log"
        ).rows == [[True]]
        assert eng.execute(
            "SELECT count() >= 1 AS c FROM system.clusters"
        ).rows == [[True]]
        # infinite numbers table: LIMIT pushes into the lazy range
        assert eng.execute(
            "SELECT number FROM system.numbers LIMIT 3"
        ).rows == [[0], [1], [2]]

    def test_values_table_function(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark=spark)
        assert eng.execute(
            "SELECT a, b FROM values('a Int64, b String', (1, 'x'), "
            "(2, 'y')) ORDER BY a"
        ).rows == [[1, "x"], [2, "y"]]
        # Spark-native VALUES and INSERT VALUES are untouched
        assert eng.execute(
            "SELECT a FROM (SELECT * FROM VALUES (7) AS t(a))"
        ).rows == [[7]]
        eng.execute("CREATE TABLE sysv_t (a UInt64)")
        try:
            eng.execute("INSERT INTO sysv_t VALUES (5)")
            assert eng.execute("SELECT a FROM sysv_t").rows == [[5]]
        finally:
            eng.execute("DROP TABLE sysv_t")


class TestPartitionBy:
    """CREATE TABLE ... PARTITION BY is honored (not dropped): data
    lands in partition directories, partition-key predicates prune at
    the scan, every write path preserves the layout, and the spec
    survives SHOW CREATE / system_parts introspection."""

    def test_partition_dirs_and_pruning(self, engine, spark):
        import os
        import re as _re

        engine.execute("DROP TABLE IF EXISTS part_tbl")
        engine.execute(
            "CREATE TABLE part_tbl (id Int64, v String, p Int32) "
            "ENGINE = MergeTree PARTITION BY p ORDER BY tuple()"
        )
        engine.execute(
            "INSERT INTO part_tbl VALUES (1,'a',1),(2,'b',2),(3,'c',1)"
        )
        path = engine._attached["part_tbl"][0]
        assert {d for d in os.listdir(path) if d.startswith("p=")} == {
            "p=1", "p=2"
        }
        plan = (
            spark.table("part_tbl").where("p = 1")
            ._jdf.queryExecution().executedPlan().toString()
        )
        m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and m.group(1).strip(), plan
        assert "(p" in m.group(1)
        out = engine.execute(
            "SELECT id, v, p FROM part_tbl WHERE p = 1 ORDER BY id"
        )
        assert out.rows == [[1, "a", 1], [3, "c", 1]]

    def test_declared_column_order_survives(self, engine):
        # Partition columns normally come back LAST from inference;
        # the declared registration must keep (id, v, p).
        out = engine.execute("SELECT * FROM part_tbl ORDER BY id")
        assert out.cols == ["id", "v", "p"]

    def test_mutation_preserves_partition_layout(self, engine, spark):
        import os

        engine.execute("ALTER TABLE part_tbl DELETE WHERE id = 3")
        path = engine._attached["part_tbl"][0]
        assert {d for d in os.listdir(path) if d.startswith("p=")} == {
            "p=1", "p=2"
        }
        out = engine.execute(
            "SELECT count() AS n FROM part_tbl WHERE p = 1"
        )
        assert out.rows == [[1]]

    def test_show_create_and_system_parts_surface_partitions(
        self, engine
    ):
        stmt = engine.execute("SHOW CREATE TABLE part_tbl").rows[0][0]
        assert "PARTITION BY (p)" in stmt
        # ... and the rendered DDL round-trips through CREATE TABLE.
        engine.execute("DROP TABLE IF EXISTS part_tbl2")
        engine.execute(stmt.replace("part_tbl", "part_tbl2", 1))
        assert engine._partitioned["part_tbl2"] == ["p"]
        engine.refresh_system_views()
        out = engine.execute(
            "SELECT DISTINCT partition FROM system_parts "
            "WHERE table = 'part_tbl' AND partition != '' "
            "ORDER BY partition"
        )
        assert out.rows == [["p=1"], ["p=2"]]

    def test_ctas_partition_by(self, engine, spark):
        import os

        engine.execute("DROP TABLE IF EXISTS part_ctas")
        engine.execute(
            "CREATE TABLE part_ctas ENGINE = MergeTree PARTITION BY p "
            "AS SELECT number AS id, number % 3 AS p FROM numbers(9)"
        )
        path = engine._attached["part_ctas"][0]
        assert sum(
            1 for d in os.listdir(path) if d.startswith("p=")
        ) == 3
        out = engine.execute(
            "SELECT count() AS n FROM part_ctas WHERE p = 0"
        )
        assert out.rows == [[3]]
        out = engine.execute("SELECT * FROM part_ctas LIMIT 1")
        assert out.cols == ["id", "p"]

    def test_expression_partition_key_refused_loudly(self, engine):
        with pytest.raises(ValueError, match="stored columns"):
            engine.execute(
                "CREATE TABLE part_bad (d DateTime) ENGINE = MergeTree "
                "PARTITION BY toYYYYMM(d) ORDER BY tuple()"
            )

    def test_truncate_keeps_schema_on_empty_partitioned_table(
        self, engine
    ):
        engine.execute("TRUNCATE TABLE part_ctas")
        out = engine.execute("SELECT * FROM part_ctas")
        assert out.cols == ["id", "p"] and out.rows == []


def test_exchange_validates_before_mutating(engine, spark, tmp_path):
    # EXCHANGE must refuse up front (not mid-swap) when one side is an
    # MV or missing — a mid-swap failure would strand the first table
    # under its temp name.
    d = str(tmp_path / "xchg_src")
    spark.createDataFrame([(1, 2)], ["k", "v"]).write.parquet(d)
    engine.attach_table("xchg_a", d)
    engine.execute(
        "CREATE MATERIALIZED VIEW xchg_mv POPULATE AS "
        "SELECT k, sum(v) AS s FROM xchg_a GROUP BY k"
    )
    with pytest.raises(ValueError, match="materialized view"):
        engine.execute("EXCHANGE TABLES xchg_a AND xchg_mv")
    with pytest.raises(ValueError, match="not found"):
        engine.execute("EXCHANGE TABLES xchg_a AND xchg_nope")
    # xchg_a must still be addressable under its own name.
    out = engine.execute("SELECT k, v FROM xchg_a")
    assert out.rows == [[1, 2]]
    engine.execute("DROP TABLE xchg_mv")


class TestAnalyzeStatistics:
    """ANALYZE TABLE promotes the attached dir to a catalog table and
    computes CBO statistics: Catalyst then plans from rowCount/column
    stats, and an UNHINTED dimension join broadcasts."""

    def test_analyze_attaches_stats_and_broadcasts(
        self, engine, spark, tmp_path
    ):
        d = str(tmp_path / "stats_dim")
        spark.range(25).selectExpr(
            "id AS k", "concat('n', id) AS name"
        ).write.parquet(d)
        engine.attach_table("stats_dim", d)
        engine.attach_table(
            "stats_fact", f"{SF_CORRECT}/customer.parquet"
        )
        out = engine.execute("ANALYZE TABLE stats_dim")
        assert out.rows == [["stats_dim"]]
        # Catalyst must see the row count on the promoted table.
        optimized = (
            spark.table("stats_dim")
            ._jdf.queryExecution().stringWithStats()
        )
        assert "rowCount=25" in optimized
        # Unhinted dim join broadcasts the analyzed side.
        plan = (
            spark.sql(
                "SELECT d.name, count(*) AS c FROM stats_fact f "
                "JOIN stats_dim d ON f.c_nationkey = d.k GROUP BY d.name"
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_writes_keep_promotion_and_refresh_stats(self, engine, spark):
        engine.execute("INSERT INTO stats_dim VALUES (100, 'n100')")
        out = engine.execute(
            "SELECT count() AS n FROM stats_dim"
        )
        assert out.rows == [[26]]
        # Still a catalog table (not shadowed by a temp view) and the
        # NOSCAN refresh kept sizeInBytes current; rowCount refreshes
        # on the next explicit ANALYZE.
        assert spark.catalog.tableExists("stats_dim")
        engine.execute(
            "ANALYZE TABLE stats_dim COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        optimized = (
            spark.table("stats_dim")
            ._jdf.queryExecution().stringWithStats()
        )
        assert "rowCount=26" in optimized

    def test_drop_cleans_catalog_table(self, engine, spark):
        engine.execute("DROP TABLE stats_dim")
        assert not spark.catalog.tableExists("stats_dim")

    def test_analyze_unattached_refused(self, engine):
        with pytest.raises(ValueError, match="not an attached"):
            engine.execute("ANALYZE TABLE never_attached_xyz")


def test_system_functions_inventory(engine):
    out = engine.execute(
        "SELECT count() AS n FROM system.functions"
    )
    assert out.rows[0][0] > 300  # the dialect maps 300+ spellings
    out = engine.execute(
        "SELECT kind FROM system.functions WHERE name = 'uniq'"
    )
    assert out.rows == [["rename"]]
    out = engine.execute(
        "SELECT count() AS n FROM system.functions "
        "WHERE kind = 'table_function'"
    )
    assert out.rows[0][0] >= 10
    # round 11: the view now enumerates the parametric builder list
    # (windowFunnel et al. were missing) and the combinators get
    # CH's separate system.aggregate_function_combinators table
    out = engine.execute(
        "SELECT count() AS c FROM system.functions WHERE name IN "
        "('windowFunnel', 'retention', 'sequenceMatch', 'topK', "
        "'arraySort', 'count')"
    )
    assert out.rows == [[6]]
    out = engine.execute(
        "SELECT name FROM system.aggregate_function_combinators "
        "ORDER BY name"
    )
    assert ["-If"] in out.rows and ["-State"] in out.rows
    assert engine.execute(
        "EXISTS TABLE system.aggregate_function_combinators"
    ).rows == [[1]]


def test_describe_table_spellings(engine, spark, tmp_path):
    d = str(tmp_path / "desc_tbl")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(d)
    engine.attach_table("desc_tbl", d)
    out = engine.execute("DESCRIBE TABLE desc_tbl")
    names = [r[0] for r in out.rows]
    assert "id" in names and "v" in names
    out = engine.execute("DESCRIBE system.clusters")
    assert any("host_name" in r for r in [r[0] for r in out.rows])


class TestAttachDetachSQL:
    """ATTACH/DETACH TABLE DDL — the reference's init-query shape
    (workflow_query_executor_test.go:85), SQL-spelled over this
    engine's parquet/csv shared storage."""

    def test_attach_from_path(self, engine):
        engine.execute("DROP TABLE IF EXISTS att_region")
        out = engine.execute(
            "ATTACH TABLE att_region FROM "
            f"'{SF_CORRECT}/region.parquet'"
        )
        assert out.rows == [["att_region"]]
        out = engine.execute("SELECT count() AS n FROM att_region")
        assert out.rows == [[5]]

    def test_attach_if_not_exists_idempotent(self, engine):
        out = engine.execute(
            "ATTACH TABLE IF NOT EXISTS att_region FROM "
            f"'{SF_CORRECT}/region.parquet'"
        )
        assert out.rows == [["att_region"]]
        with pytest.raises(ValueError, match="already attached"):
            engine.execute(
                "ATTACH TABLE att_region FROM "
                f"'{SF_CORRECT}/region.parquet'"
            )

    def test_attach_csv_with_schema(self, engine, tmp_path):
        p = tmp_path / "att.csv"
        p.write_text("k,v\n1,a\n2,b\n")
        out = engine.execute(
            "ATTACH TABLE att_csv (k UInt32, v String) FROM "
            f"'file://{p}' FORMAT CSVWithNames"
        )
        assert out.rows == [["att_csv"]]
        out = engine.execute("SELECT k, v FROM att_csv ORDER BY k")
        assert out.rows == [[1, "a"], [2, "b"]]

    def test_detach_then_reattach(self, engine):
        engine.execute("DETACH TABLE att_region")
        with pytest.raises(Exception):
            engine.execute("SELECT count() FROM att_region")
        out = engine.execute("ATTACH TABLE att_region")
        assert out.rows == [["att_region"]]
        out = engine.execute("SELECT count() AS n FROM att_region")
        assert out.rows == [[5]]

    def test_web_disk_mergetree_form_guided_error(self, engine):
        with pytest.raises(ValueError, match="MergeTree part storage"):
            engine.execute(
                "ATTACH TABLE github_events UUID 'abc' "
                "(id UInt64) ENGINE = MergeTree ORDER BY id "
                "SETTINGS disk = disk(type=web, "
                "endpoint='http://example.com/web/')"
            )

    def test_attach_partitioned_dir(self, engine, spark, tmp_path):
        d = str(tmp_path / "att_part")
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 2)], ["id", "v", "p"]
        ).write.partitionBy("p").parquet(d)
        out = engine.execute(
            "ATTACH TABLE att_part (id Int64, v String, p Int32) "
            f"FROM '{d}' ENGINE = MergeTree PARTITION BY p"
        )
        assert out.rows == [["att_part"]]
        assert engine._partitioned["att_part"] == ["p"]
        engine.execute("INSERT INTO att_part VALUES (3, 'c', 1)")
        out = engine.execute(
            "SELECT count() AS n FROM att_part WHERE p = 1"
        )
        assert out.rows == [[2]]


def test_init_queries_run_attach_ddl(engine):
    # The reference's actual init-query shape: ATTACH DDL + SET
    # before the main query (workflow_query_executor.go:302-310).
    engine.execute("DROP TABLE IF EXISTS init_att")
    out = engine.execute(
        QueryRequest(
            query="SELECT count() AS n FROM init_att",
            init_queries=[
                f"ATTACH TABLE init_att FROM '{SF_CORRECT}/nation.parquet'",
                "SET spark.sql.shuffle.partitions=8",
            ],
        )
    )
    assert out.rows == [[25]]
    engine.execute("DROP TABLE init_att")


def test_analyze_partitioned_table(engine, spark):
    engine.execute("DROP TABLE IF EXISTS part_stats")
    engine.execute(
        "CREATE TABLE part_stats ENGINE = MergeTree PARTITION BY p AS "
        "SELECT number AS id, number % 3 AS p FROM numbers(9)"
    )
    out = engine.execute("ANALYZE TABLE part_stats")
    assert out.rows == [["part_stats"]]
    # Catalog table sees all partitions and carries stats.
    assert spark.catalog.tableExists("part_stats")
    out = engine.execute("SELECT count() AS n FROM part_stats")
    assert out.rows == [[9]]
    stats = (
        spark.table("part_stats")
        ._jdf.queryExecution().stringWithStats()
    )
    assert "rowCount=9" in stats
    # Partition pruning still applies on the catalog table.
    plan = (
        spark.table("part_stats").where("p = 1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "p#" in plan.split(
        "PartitionFilters"
    )[1][:120]
    # Writes into new partitions surface after the re-attach MSCK.
    engine.execute("INSERT INTO part_stats VALUES (100, 7)")
    out = engine.execute(
        "SELECT count() AS n FROM part_stats WHERE p = 7"
    )
    assert out.rows == [[1]]
    engine.execute("DROP TABLE part_stats")


class TestOrderByHonored:
    """CREATE TABLE ... ORDER BY = MergeTree's primary sort: every
    write lands files sorted by the key (sortWithinPartitions), so
    parquet footer min/max ranges are narrow and range predicates
    prune row groups — the CH data-skipping analog."""

    def test_inserts_are_file_sorted(self, engine, spark):
        import glob

        import pyarrow.parquet as pq

        engine.execute("DROP TABLE IF EXISTS ord_tbl")
        engine.execute(
            "CREATE TABLE ord_tbl (id Int64, v String) "
            "ENGINE = MergeTree ORDER BY id"
        )
        assert engine._ordered["ord_tbl"] == ["id"]
        # Deliberately unsorted insert.
        engine.execute(
            "INSERT INTO ord_tbl VALUES (5,'e'),(1,'a'),(3,'c'),"
            "(4,'d'),(2,'b')"
        )
        path = engine._attached["ord_tbl"][0]
        for f in glob.glob(f"{path}/*.parquet"):
            ids = pq.read_table(f, columns=["id"])["id"].to_pylist()
            assert ids == sorted(ids), f"file {f} not sorted"
        out = engine.execute("SELECT v FROM ord_tbl WHERE id = 3")
        assert out.rows == [["c"]]

    def test_order_survives_mutation_and_shows_in_ddl(
        self, engine, spark
    ):
        import glob

        import pyarrow.parquet as pq

        stmt = engine.execute("SHOW CREATE TABLE ord_tbl").rows[0][0]
        assert "ORDER BY (id)" in stmt
        engine.execute("ALTER TABLE ord_tbl DELETE WHERE id = 3")
        path = engine._attached["ord_tbl"][0]
        for f in glob.glob(f"{path}/*.parquet"):
            ids = pq.read_table(f, columns=["id"])["id"].to_pylist()
            assert ids == sorted(ids)
        # Round-trip: the rendered DDL re-parses with the order key.
        engine.execute("DROP TABLE IF EXISTS ord_tbl2")
        engine.execute(stmt.replace("ord_tbl", "ord_tbl2", 1))
        assert engine._ordered["ord_tbl2"] == ["id"]
        engine.execute("DROP TABLE ord_tbl")
        engine.execute("DROP TABLE ord_tbl2")

    def test_expression_order_key_dropped_silently(self, engine):
        engine.execute("DROP TABLE IF EXISTS ord_expr")
        engine.execute(
            "CREATE TABLE ord_expr (d DateTime, v Int64) "
            "ENGINE = MergeTree ORDER BY (toYYYYMM(d), v)"
        )
        assert "ord_expr" not in engine._ordered
        engine.execute("DROP TABLE ord_expr")


class TestPartitionManagement:
    """ALTER TABLE DROP/DETACH/ATTACH PARTITION — CH's O(metadata)
    retention operations over the honored partition layout: a dropped
    month is one directory removal, never a table rewrite."""

    def test_drop_partition(self, engine):
        engine.execute("DROP TABLE IF EXISTS pm_tbl")
        engine.execute(
            "CREATE TABLE pm_tbl ENGINE = MergeTree PARTITION BY p AS "
            "SELECT number AS id, number % 3 AS p FROM numbers(9)"
        )
        out = engine.execute("ALTER TABLE pm_tbl DROP PARTITION '1'")
        assert out.rows == [["p=1"]]
        out = engine.execute(
            "SELECT count() AS n, count(DISTINCT p) AS parts FROM pm_tbl"
        )
        assert out.rows == [[6, 2]]
        # Dropping a nonexistent partition is a no-op, not an error.
        out = engine.execute("ALTER TABLE pm_tbl DROP PARTITION '9'")
        assert out.rows == [[""]]

    def test_detach_then_attach_partition(self, engine):
        out = engine.execute("ALTER TABLE pm_tbl DETACH PARTITION 2")
        assert out.rows == [["p=2"]]
        out = engine.execute("SELECT count() AS n FROM pm_tbl")
        assert out.rows == [[3]]
        out = engine.execute("ALTER TABLE pm_tbl ATTACH PARTITION 2")
        assert out.rows == [["p=2"]]
        out = engine.execute(
            "SELECT count() AS n FROM pm_tbl WHERE p = 2"
        )
        assert out.rows == [[3]]

    def test_partition_ddl_refused_on_unpartitioned(self, engine, spark, tmp_path):
        d = str(tmp_path / "pm_flat")
        spark.range(3).write.parquet(d)
        engine.attach_table("pm_flat", d)
        with pytest.raises(ValueError, match="not partitioned"):
            engine.execute("ALTER TABLE pm_flat DROP PARTITION '1'")
        engine.execute("DROP TABLE pm_tbl")
        engine.execute("DROP TABLE pm_flat")


def test_uptime_and_processlist(engine):
    out = engine.execute("SELECT uptime() AS u")
    assert out.rows[0][0] >= 0
    out = engine.execute("SHOW PROCESSLIST")
    # CH semantics: the in-flight query list (killable ids).
    assert out.cols == ["query_id", "query", "elapsed_sec"]
    out = engine.execute("SELECT * FROM system_profile")
    assert "queries_executed" in out.cols


class TestReviewFindingsRound5:
    """Regression tests for the round-5 self-review findings."""

    def test_attach_schema_with_parameterized_types(self, engine, tmp_path):
        # Decimal(10,2) in the ATTACH schema clause (nested parens).
        p = tmp_path / "att_dec.csv"
        p.write_text("k,m\n1,1.50\n2,2.25\n")
        out = engine.execute(
            "ATTACH TABLE att_dec (k UInt32, m Decimal(10, 2)) FROM "
            f"'file://{p}' FORMAT CSVWithNames"
        )
        assert out.rows == [["att_dec"]]
        out = engine.execute(
            "SELECT CAST(sum(m) AS DOUBLE) AS s FROM att_dec"
        )
        assert out.rows == [[3.75]]
        engine.execute("DROP TABLE att_dec")

    def test_release_fires_once_per_outer_request(
        self, engine, monkeypatch
    ):
        # Init queries re-enter execute(); resource release must fire
        # exactly ONCE, at the outermost boundary — a nested release
        # would drop the enclosing request's scratch caches and spool
        # pins mid-flight.
        import bighouse_spark.engine as eng_mod

        calls = {"n": 0}
        real = eng_mod.release_tracked

        def counting():
            calls["n"] += 1
            return real()

        monkeypatch.setattr(eng_mod, "release_tracked", counting)
        engine.execute(
            QueryRequest(
                query="SELECT 1 AS x",
                init_queries=[
                    "EXISTS some_random_name",
                    "EXISTS another_random_name",
                ],
            )
        )
        assert calls["n"] == 1

    def test_analyze_keeps_declared_column_order(self, engine, spark):
        engine.execute("DROP TABLE IF EXISTS ord_stats")
        engine.execute(
            "CREATE TABLE ord_stats (id Int64, p Int32, v String) "
            "ENGINE = MergeTree PARTITION BY p"
        )
        engine.execute(
            "INSERT INTO ord_stats VALUES (1, 1, 'a'), (2, 2, 'b')"
        )
        before = engine.execute("SELECT * FROM ord_stats LIMIT 0").cols
        engine.execute("ANALYZE TABLE ord_stats")
        after = engine.execute("SELECT * FROM ord_stats LIMIT 0").cols
        # ANALYZE is a statistics-only operation: SELECT * shape must
        # not change. (Partition columns surface last from Spark's
        # partitioned reads regardless of declaration order — the
        # invariant here is stability across ANALYZE, which used to
        # silently reorder a declared-order registration.)
        assert before == after
        engine.execute("DROP TABLE ord_stats")

    def test_drop_partition_on_analyzed_table(self, engine, spark):
        engine.execute("DROP TABLE IF EXISTS adp_tbl")
        engine.execute(
            "CREATE TABLE adp_tbl ENGINE = MergeTree PARTITION BY p AS "
            "SELECT number AS id, number % 3 AS p FROM numbers(9)"
        )
        engine.execute("ANALYZE TABLE adp_tbl")
        engine.execute("ALTER TABLE adp_tbl DROP PARTITION '1'")
        # SYNC PARTITIONS must have dropped the stale catalog
        # partition — the scan may not fail on the missing dir.
        out = engine.execute("SELECT count() AS n FROM adp_tbl")
        assert out.rows == [[6]]
        engine.execute("DROP TABLE adp_tbl")

    def test_detach_partition_collision_refused(self, engine):
        engine.execute("DROP TABLE IF EXISTS dpc_tbl")
        engine.execute(
            "CREATE TABLE dpc_tbl ENGINE = MergeTree PARTITION BY p AS "
            "SELECT number AS id, number % 2 AS p FROM numbers(4)"
        )
        engine.execute("ALTER TABLE dpc_tbl DETACH PARTITION '1'")
        engine.execute("INSERT INTO dpc_tbl VALUES (9, 1)")
        # Re-attaching over a recreated live partition must refuse,
        # not nest directories.
        with pytest.raises(ValueError, match="already exists"):
            engine.execute("ALTER TABLE dpc_tbl ATTACH PARTITION '1'")
        # And detaching again while a detached copy exists: refused.
        with pytest.raises(ValueError, match="already exists"):
            engine.execute("ALTER TABLE dpc_tbl DETACH PARTITION '1'")
        engine.execute("DROP TABLE dpc_tbl")


class TestQueryLifecycleControl:
    """max_execution_time enforcement, KILL QUERY, system_processes —
    the CH query-lifecycle surface (each SELECT runs in its own Spark
    job group named by a query_id)."""

    def test_max_execution_time_cancels(self, engine):
        import time

        t0 = time.time()
        with pytest.raises(TimeoutError, match="TIMEOUT_EXCEEDED"):
            engine.execute(
                "SELECT count() AS c FROM numbers(500000000) a, "
                "numbers(10000) b SETTINGS max_execution_time=2"
            )
        # cancelled promptly, not after the full cross join
        assert time.time() - t0 < 30

    def test_max_execution_time_noop_when_fast(self, engine):
        out = engine.execute(
            "SELECT count() AS c FROM numbers(100) "
            "SETTINGS max_execution_time=60"
        )
        assert out.rows == [[100]]

    def test_kill_query_cancels_other_thread(self, engine):
        import threading
        import time

        res = {}

        def victim():
            try:
                engine.execute(
                    "SELECT count() AS c FROM numbers(500000000) a, "
                    "numbers(10000) b"
                )
                res["r"] = "finished"
            except Exception as e:
                res["r"] = f"{type(e).__name__}: {e}"

        th = threading.Thread(target=victim)
        th.start()
        deadline = time.time() + 30
        qid = None
        while time.time() < deadline and qid is None:
            with engine._inflight_lock:
                for k, (sql, _) in engine._inflight.items():
                    if "500000000" in sql:
                        qid = k
            time.sleep(0.1)
        assert qid, "victim query never registered in-flight"
        out = engine.execute(f"KILL QUERY WHERE query_id = '{qid}'")
        assert out.rows == [["waiting", qid]]
        th.join(60)
        assert "cancelled" in res.get("r", "")

    def test_kill_unknown_query_id_empty(self, engine):
        out = engine.execute("KILL QUERY WHERE query_id = 'nope'")
        assert out.cols == ["kill_status", "query_id"]
        assert out.rows == []

    def test_system_processes_view(self, engine):
        engine.refresh_system_views()
        out = engine.execute(
            "SELECT query_id, query, elapsed_sec FROM system_processes"
        )
        # Idle at refresh time: the snapshot is empty but queryable.
        assert out.cols == ["query_id", "query", "elapsed_sec"]


class TestResultRowLimits:
    """SETTINGS max_result_rows / result_overflow_mode — enforced via
    limit(N+1) so oversized results never reach the driver."""

    def test_throw_mode_default(self, engine):
        with pytest.raises(ValueError, match="TOO_MANY_ROWS"):
            engine.execute(
                "SELECT number FROM numbers(100) "
                "SETTINGS max_result_rows=10"
            )

    def test_break_mode_truncates(self, engine):
        out = engine.execute(
            "SELECT number FROM numbers(100) ORDER BY number "
            "SETTINGS max_result_rows=10, result_overflow_mode='break'"
        )
        assert len(out.rows) == 10
        assert out.rows[0] == [0]

    def test_under_limit_untouched(self, engine):
        out = engine.execute(
            "SELECT number FROM numbers(5) "
            "SETTINGS max_result_rows=10"
        )
        assert len(out.rows) == 5


def test_dictget_unknown_dictionary_guided_error(engine):
    with pytest.raises(ValueError, match="CREATE DICTIONARY"):
        engine.execute("SELECT dictGet('nope', 'attr', 1) AS v")


class TestUndropAndComments:
    """UNDROP TABLE (possible here because DROP keeps the shared
    backing storage — only a tombstone re-attach is needed) and
    ALTER TABLE ... COMMENT COLUMN metadata via system_columns."""

    def test_drop_then_undrop_restores(self, engine, spark, tmp_path):
        import pandas as pd

        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}).to_parquet(
            tmp_path / "ud.parquet"
        )
        engine.attach_table("ud_tbl", str(tmp_path / "ud.parquet"))
        engine.execute(QueryRequest(query="DROP TABLE ud_tbl"))
        assert (
            engine.execute(QueryRequest(query="EXISTS ud_tbl")).rows
            == [[0]]
        )
        r = engine.execute(QueryRequest(query="UNDROP TABLE ud_tbl"))
        assert r.rows == [["ud_tbl"]]
        assert engine.execute(
            QueryRequest(query="SELECT count() AS c FROM ud_tbl")
        ).rows == [[3]]
        engine.execute(QueryRequest(query="DROP TABLE ud_tbl"))

    def test_undrop_unknown_refused(self, engine):
        import pytest

        with pytest.raises(ValueError, match="restorable"):
            engine.execute(QueryRequest(query="UNDROP TABLE never_was_zz"))

    def test_comment_column_surfaces_in_system_columns(
        self, engine, spark, tmp_path
    ):
        import pandas as pd

        pd.DataFrame({"k": [1]}).to_parquet(tmp_path / "cc.parquet")
        engine.attach_table("cc_tbl", str(tmp_path / "cc.parquet"))
        engine.execute(
            QueryRequest(
                query="ALTER TABLE cc_tbl COMMENT COLUMN k 'the key'"
            )
        )
        engine.refresh_system_views()
        r = engine.execute(
            QueryRequest(
                query="SELECT comment FROM system_columns "
                "WHERE table = 'cc_tbl' AND name = 'k'"
            )
        )
        assert r.rows == [["the key"]]
        import pytest

        with pytest.raises(ValueError, match="no column"):
            engine.execute(
                QueryRequest(
                    query="ALTER TABLE cc_tbl COMMENT COLUMN zz 'x'"
                )
            )
        engine.execute(QueryRequest(query="DROP TABLE cc_tbl"))


class TestOutfileAndUndropHardening:
    """Third-review hardening: INTO OUTFILE is refused over network
    endpoints (arbitrary-file-write hole otherwise — CH servers
    reject it too), validates format and overwrite policy BEFORE
    running the inner query; UNDROP is retryable after a failed
    attempt and refuses names held by any object class."""

    def test_outfile_refused_for_remote_requests(self, engine):
        import pytest

        with pytest.raises(ValueError, match="network"):
            engine.execute(
                QueryRequest(
                    query="SELECT 1 INTO OUTFILE '/tmp/evil_zz'",
                    remote=True,
                )
            )

    def test_outfile_overwrite_needs_truncate(self, engine, tmp_path):
        import pytest

        p = str(tmp_path / "o.csv")
        engine.execute(f"SELECT 1 AS x INTO OUTFILE '{p}' FORMAT CSV")
        with pytest.raises(ValueError, match="TRUNCATE"):
            engine.execute(f"SELECT 2 AS x INTO OUTFILE '{p}' FORMAT CSV")
        engine.execute(
            f"SELECT 2 AS x INTO OUTFILE '{p}' TRUNCATE FORMAT CSV"
        )
        assert open(p).read().strip() == "2"

    def test_outfile_bad_format_fails_before_running(self, engine, tmp_path):
        import os

        import pytest

        p = str(tmp_path / "never.csv")
        with pytest.raises(ValueError, match="unknown FORMAT"):
            engine.execute(f"SELECT 1 INTO OUTFILE '{p}' FORMAT Bogus")
        assert not os.path.exists(p)

    def test_undrop_retryable_and_clobber_guard(
        self, engine, spark, tmp_path
    ):
        import pandas as pd
        import pytest

        pd.DataFrame({"k": [1]}).to_parquet(tmp_path / "a.parquet")
        engine.attach_table("uh_t", str(tmp_path / "a.parquet"))
        engine.execute(QueryRequest(query="DROP TABLE uh_t"))
        # Name occupied by a user view → refused, tombstone KEPT.
        engine.execute(
            QueryRequest(query="CREATE VIEW uh_t AS SELECT 1 AS x")
        )
        with pytest.raises(ValueError, match="in use"):
            engine.execute(QueryRequest(query="UNDROP TABLE uh_t"))
        engine.execute(QueryRequest(query="DROP VIEW uh_t"))
        r = engine.execute(QueryRequest(query="UNDROP TABLE uh_t"))
        assert r.rows == [["uh_t"]]
        engine.execute(QueryRequest(query="DROP TABLE uh_t"))

    def test_comment_if_exists_noop(self, engine, spark, tmp_path):
        import pandas as pd

        pd.DataFrame({"k": [1]}).to_parquet(tmp_path / "c.parquet")
        engine.attach_table("uh_c", str(tmp_path / "c.parquet"))
        r = engine.execute(
            QueryRequest(
                query="ALTER TABLE uh_c COMMENT COLUMN IF EXISTS ghost 'x'"
            )
        )
        assert r.rows == []
        engine.execute(QueryRequest(query="DROP TABLE uh_c"))


class TestSystemOpsStatements:
    """CH ops surface: SYSTEM maintenance statements, KILL MUTATION
    (vacuous — mutations here are eager synchronous rewrites),
    SHOW SETTINGS/GRANTS, CHECK TABLE readability probe."""

    def test_system_statements_succeed(self, engine):
        for q in (
            "SYSTEM FLUSH LOGS",
            "SYSTEM DROP QUERY CACHE",
            "SYSTEM RELOAD DICTIONARIES",
            "SYSTEM DROP MARK CACHE",
            "SYSTEM DROP UNCOMPRESSED CACHE",
        ):
            assert engine.execute(QueryRequest(query=q)).rows == [[1]]

    def test_kill_mutation_vacuous(self, engine):
        r = engine.execute(
            QueryRequest(query="KILL MUTATION WHERE mutation_id = 'x'")
        )
        assert r.rows == []

    def test_show_settings_filters(self, engine):
        r = engine.execute(
            QueryRequest(query="SHOW SETTINGS LIKE 'spark.sql.adaptive%'")
        )
        assert r.rows  # AQE knobs always present
        assert all(
            row[0].startswith("spark.sql.adaptive") for row in r.rows
        )
        # ILIKE is case-insensitive (CH semantics).
        r2 = engine.execute(
            QueryRequest(query="SHOW SETTINGS ILIKE 'SPARK.SQL.ADAPTIVE%'")
        )
        assert len(r2.rows) == len(r.rows)

    def test_show_grants_trust_model(self, engine):
        r = engine.execute(QueryRequest(query="SHOW GRANTS"))
        assert "GRANT ALL" in r.rows[0][0]

    def test_check_table(self, engine, spark, tmp_path):
        import pandas as pd

        pd.DataFrame({"k": [1]}).to_parquet(tmp_path / "ok.parquet")
        engine.attach_table("chk_t", str(tmp_path / "ok.parquet"))
        assert engine.execute(
            QueryRequest(query="CHECK TABLE chk_t")
        ).rows == [[1]]
        assert engine.execute(
            QueryRequest(query="CHECK TABLE missing_zz")
        ).rows == [[0]]
        engine.execute(QueryRequest(query="DROP TABLE chk_t"))


class TestInsertInputTransform:
    """INSERT INTO t SELECT ... FROM input('schema') FORMAT fmt
    <payload>: CH's INSERT-time reshape. The payload parses with the
    declared structure, the SELECT transforms it (expressions, WHERE),
    and the write re-enters the ordinary INSERT ... SELECT path."""

    @pytest.fixture()
    def eng_t(self, spark, tmp_path):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        spark.createDataFrame(
            [(0, "seed", 0.0)], "k int, s string, v double"
        ).write.parquet(str(tmp_path / "t"))
        eng.attach_table("inp_tf_t", str(tmp_path / "t"))
        yield eng
        eng.execute("DROP TABLE IF EXISTS inp_tf_t")

    def test_csv_transform_and_filter(self, eng_t):
        eng_t.execute(
            "INSERT INTO inp_tf_t SELECT k, upper(s) AS s, v * 2 AS v "
            "FROM input('k Int32, s String, v Float64') WHERE v > 0 "
            "FORMAT CSV\n1,abc,1.5\n2,def,0\n3,ghi,2.5"
        )
        rows = sorted(eng_t.execute("SELECT * FROM inp_tf_t").rows)
        assert rows == [[0, "seed", 0.0], [1, "ABC", 3.0],
                        [3, "GHI", 5.0]]

    def test_jsoneachrow_numeric_coercion(self, eng_t):
        # JSON integer 1 must land in the Float64 column
        eng_t.execute(
            "INSERT INTO inp_tf_t SELECT k, s, v + 100 "
            "FROM input('k Int32, s String, v Float64') "
            'FORMAT JSONEachRow\n{"k": 9, "s": "j", "v": 1}'
        )
        assert eng_t.execute(
            "SELECT * FROM inp_tf_t WHERE k = 9"
        ).rows == [[9, "j", 101.0]]

    def test_column_list_form(self, eng_t):
        eng_t.execute(
            "INSERT INTO inp_tf_t (k, s, v) SELECT k + 10, s, 0.5 "
            "FROM input('k Int32, s String') "
            "FORMAT CSV\n5,five"
        )
        assert eng_t.execute(
            "SELECT * FROM inp_tf_t WHERE k = 15"
        ).rows == [[15, "five", 0.5]]


class TestNullEngineTables:
    """ENGINE = Null: INSERTs fan out to dependent materialized views
    and are then discarded — the CH Null+MV ingestion pattern. Reads
    always see an empty table; other engines are untouched."""

    def test_null_mv_ingestion_pattern(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        eng.execute(
            "CREATE TABLE nulleng_src (k UInt64, v Float64) "
            "ENGINE = Null"
        )
        eng.execute(
            "CREATE MATERIALIZED VIEW nulleng_mv AS "
            "SELECT k, sum(v) AS s FROM nulleng_src GROUP BY k"
        )
        try:
            eng.execute(
                "INSERT INTO nulleng_src VALUES (1, 2.5), (1, 1.5), "
                "(2, 1.0)"
            )
            assert eng.execute(
                "SELECT count() AS c FROM nulleng_src"
            ).rows == [[0]]
            assert sorted(
                eng.execute("SELECT * FROM nulleng_mv").rows
            ) == [[1, 4.0], [2, 1.0]]
            # second insert keeps accumulating, still discards
            eng.execute("INSERT INTO nulleng_src VALUES (2, 9.0)")
            assert eng.execute(
                "SELECT count() AS c FROM nulleng_src"
            ).rows == [[0]]
            assert sorted(
                eng.execute("SELECT * FROM nulleng_mv").rows
            ) == [[1, 4.0], [2, 10.0]]
        finally:
            eng.execute("DROP TABLE IF EXISTS nulleng_src")

    def test_ctas_into_null_and_other_engines(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        try:
            eng.execute(
                "CREATE TABLE nulleng_c ENGINE = Null AS SELECT 1 AS a"
            )
            assert eng.execute(
                "SELECT count() AS c FROM nulleng_c"
            ).rows == [[0]]
            eng.execute(
                "CREATE TABLE nulleng_m (k UInt64) ENGINE = Memory"
            )
            eng.execute("INSERT INTO nulleng_m VALUES (1)")
            assert eng.execute(
                "SELECT count() AS c FROM nulleng_m"
            ).rows == [[1]]
        finally:
            eng.execute("DROP TABLE IF EXISTS nulleng_c")
            eng.execute("DROP TABLE IF EXISTS nulleng_m")


class TestReviewFindingsRound7Engine:
    """Regression pins for the engine-side round-7 review findings."""

    def test_params_never_touch_insert_payload(self, spark, tmp_path):
        from bighouse_spark.engine import BigHouseEngine, QueryRequest

        eng = BigHouseEngine(spark)
        spark.createDataFrame([(0, "x")], "k int, s string") \
            .write.parquet(str(tmp_path / "t"))
        eng.attach_table("rf_pay_t", str(tmp_path / "t"))
        try:
            # a CSV value shaped like a placeholder must pass through
            # verbatim — neither substituted nor rejected
            eng.execute(QueryRequest(
                query="INSERT INTO rf_pay_t FORMAT CSV\n"
                "1,{level:String}\n2,plain"
            ))
            rows = sorted(eng.execute("SELECT * FROM rf_pay_t").rows)
            assert rows == [[0, "x"], [1, "{level:String}"],
                            [2, "plain"]]
        finally:
            eng.execute("DROP TABLE IF EXISTS rf_pay_t")

    def test_rename_migrates_null_engine_flag(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        try:
            eng.execute(
                "CREATE TABLE rf_null (k UInt64) ENGINE = Null"
            )
            eng.execute("RENAME TABLE rf_null TO rf_null_renamed")
            eng.execute("INSERT INTO rf_null_renamed VALUES (1)")
            assert eng.execute(
                "SELECT count() AS c FROM rf_null_renamed"
            ).rows == [[0]]
            # re-creating the old name as Memory must NOT inherit
            # the stale discard flag
            eng.execute(
                "CREATE TABLE rf_null (k UInt64) ENGINE = Memory"
            )
            eng.execute("INSERT INTO rf_null VALUES (7)")
            assert eng.execute(
                "SELECT count() AS c FROM rf_null"
            ).rows == [[1]]
        finally:
            eng.execute("DROP TABLE IF EXISTS rf_null")
            eng.execute("DROP TABLE IF EXISTS rf_null_renamed")


def test_round11_introspection_dotted_and_databases(engine):
    # sixth round-11 probe: dotted system names in SHOW CREATE /
    # CHECK TABLE, and the system.databases twin
    assert engine.execute(
        "SELECT name, engine FROM system.databases ORDER BY name"
    ).rows == [["default", "Atomic"], ["system", "Memory"]]
    stmt = engine.execute("SHOW CREATE TABLE system.one").rows[0][0]
    assert stmt.startswith("CREATE VIEW system_one")
    assert engine.execute("CHECK TABLE system.one").rows == [[1]]
    assert engine.execute("EXISTS TABLE system.databases").rows == [[1]]


class TestAlterMaintenance:
    """Round-11 MergeTree-maintenance family: data-skipping indices
    materialized as parquet column-chunk bloom filters, TTL applied
    at OPTIMIZE (CH applies TTL at merge time), CLEAR COLUMN resets
    to the type default, FREEZE hardlink snapshots, PROJECTION
    guided refusal."""

    @pytest.fixture
    def tbl(self, engine):
        engine.execute("DROP TABLE IF EXISTS __alt_m")
        engine.execute(
            "CREATE TABLE __alt_m (id UInt32, v String, d DateTime) "
            "ENGINE = MergeTree ORDER BY id"
        )
        engine.execute(
            "INSERT INTO __alt_m VALUES "
            "(1, 'aaa111', '2020-01-01 00:00:00'), "
            "(2, 'bbb222', '2099-01-01 00:00:00')"
        )
        yield "__alt_m"
        engine.execute("DROP TABLE IF EXISTS __alt_m")

    def test_skip_index_lifecycle_and_bloom_write(self, engine, tbl):
        assert engine.execute(
            f"ALTER TABLE {tbl} ADD INDEX ix_v v TYPE bloom_filter "
            "GRANULARITY 1"
        ).rows == [[tbl, "ix_v", "bloom_filter"]]
        engine.execute(f"ALTER TABLE {tbl} MATERIALIZE INDEX ix_v")
        # per-column writer options proven on disk: the bloom column
        # is written WITHOUT a dictionary (parquet-mr omits blooms
        # for fully dictionary-encoded chunks), while the untouched
        # string-ish timestamp column keeps its dictionary
        import glob

        import pyarrow.parquet as pq

        path = engine._attached[tbl][0]
        local = path[7:] if path.startswith("file://") else path
        encs = {}
        for f in glob.glob(local + "/**/*.parquet", recursive=True):
            md = pq.ParquetFile(f).metadata
            for c in range(md.num_columns):
                col = md.row_group(0).column(c)
                encs[col.path_in_schema] = col.encodings
        assert "PLAIN_DICTIONARY" not in encs["v"]
        assert engine.execute(
            "SELECT name, type FROM system.data_skipping_indices "
            f"WHERE table = '{tbl}'"
        ).rows == [["ix_v", "bloom_filter"]]
        engine.execute(f"ALTER TABLE {tbl} DROP INDEX ix_v")
        assert engine.execute(
            "SELECT count() AS c FROM system.data_skipping_indices "
            f"WHERE table = '{tbl}'"
        ).rows == [[0]]

    def test_bloom_needs_plain_column(self, engine, tbl):
        with pytest.raises(ValueError, match="PLAIN COLUMN"):
            engine.execute(
                f"ALTER TABLE {tbl} ADD INDEX ix_x lower(v) "
                "TYPE bloom_filter"
            )
        # minmax/set accept expressions (recorded for introspection)
        engine.execute(
            f"ALTER TABLE {tbl} ADD INDEX ix_e lower(v) TYPE minmax"
        )

    def test_ttl_applied_at_optimize(self, engine, tbl):
        engine.execute(
            f"ALTER TABLE {tbl} MODIFY TTL d + INTERVAL 1 DAY"
        )
        assert engine.execute(
            "SELECT ttl FROM system.table_ttl WHERE table = "
            f"'{tbl}'"
        ).rows == [["d + INTERVAL 1 DAY"]]
        engine.execute(f"OPTIMIZE TABLE {tbl} FINAL")
        # the 2020 row expired; 2099 survives
        assert engine.execute(
            f"SELECT id FROM {tbl} ORDER BY id"
        ).rows == [[2]]
        engine.execute(f"ALTER TABLE {tbl} REMOVE TTL")
        assert engine.execute(
            "SELECT count() AS c FROM system.table_ttl"
        ).rows == [[0]]

    def test_ttl_validates_at_alter_time(self, engine, tbl):
        with pytest.raises(Exception):
            engine.execute(
                f"ALTER TABLE {tbl} MODIFY TTL no_such_col + "
                "INTERVAL 1 DAY"
            )

    def test_clear_column_resets_to_type_default(self, engine, tbl):
        engine.execute(f"ALTER TABLE {tbl} CLEAR COLUMN v")
        assert engine.execute(
            f"SELECT id, v FROM {tbl} ORDER BY id"
        ).rows == [[1, ""], [2, ""]]
        with pytest.raises(ValueError, match="IN PARTITION"):
            engine.execute(
                f"ALTER TABLE {tbl} CLEAR COLUMN v IN PARTITION 'x'"
            )

    def test_freeze_hardlink_snapshot(self, engine, tbl):
        import os

        shadow, files = engine.execute(
            f"ALTER TABLE {tbl} FREEZE"
        ).rows[0]
        assert files >= 1 and os.path.isdir(shadow)
        named, _ = engine.execute(
            f"ALTER TABLE {tbl} FREEZE WITH NAME 'snapA'"
        ).rows[0]
        assert named.endswith("/snapA")
        with pytest.raises(ValueError, match="exists"):
            engine.execute(
                f"ALTER TABLE {tbl} FREEZE WITH NAME 'snapA'"
            )
        # mutations after FREEZE leave the snapshot intact
        engine.execute(f"ALTER TABLE {tbl} DELETE WHERE id = 1")
        assert os.path.isdir(shadow)

    def test_projection_refusal(self, engine, tbl):
        with pytest.raises(ValueError, match="MATERIALIZED VIEW"):
            engine.execute(
                f"ALTER TABLE {tbl} ADD PROJECTION p1 "
                "(SELECT id ORDER BY id)"
            )

    def test_rename_migrates_maintenance_state(self, engine, tbl):
        engine.execute(
            f"ALTER TABLE {tbl} ADD INDEX ix2 v TYPE bloom_filter"
        )
        engine.execute(
            f"ALTER TABLE {tbl} MODIFY TTL d + INTERVAL 30 DAY"
        )
        engine.execute(f"RENAME TABLE {tbl} TO __alt_m2")
        try:
            assert engine.execute(
                "SELECT name FROM system.data_skipping_indices "
                "WHERE table = '__alt_m2'"
            ).rows == [["ix2"]]
            assert engine.execute(
                "SELECT count() AS c FROM system.table_ttl "
                "WHERE table = '__alt_m2'"
            ).rows == [[1]]
        finally:
            engine.execute("DROP TABLE IF EXISTS __alt_m2")
        assert engine.execute(
            "SELECT count() AS c FROM system.data_skipping_indices"
        ).rows == [[0]]


def test_system_background_toggles_ack(engine):
    # round 11: SYSTEM STOP/START MERGES etc. acknowledge as no-ops
    # (merges are explicit OPTIMIZE, mutations synchronous)
    for stmt in (
        "SYSTEM STOP MERGES",
        "SYSTEM START MERGES",
        "SYSTEM STOP TTL MERGES",
        "SYSTEM STOP MOVES",
        "SYSTEM START REPLICATION QUEUES",
        "SYSTEM STOP MERGES some_table",
    ):
        assert engine.execute(stmt).rows == [[1]], stmt


def test_rbac_family_trust_model(engine):
    # GRANT / SET ROLE are vacuous under the all-privileges trust
    # model and acknowledge; REVOKE and user DDL refuse loudly
    assert engine.execute("GRANT SELECT ON *.* TO default").rows == [[1]]
    assert engine.execute("SET ROLE NONE").rows == [[1]]
    assert engine.execute("SHOW USERS").rows == [["default"]]
    for stmt in (
        "REVOKE SELECT ON *.* FROM default",
        "CREATE USER u IDENTIFIED BY 'x'",
        "DROP ROLE r",
        "CREATE ROW POLICY p ON t",
    ):
        with pytest.raises(ValueError, match="trust auth model"):
            engine.execute(stmt)


class TestRound12MaintenanceSeams:
    """VERDICT r11 Next #3: maintenance ALTERs x MVs and bloom
    skip-indices x mutations/OPTIMIZE (the whole-part rewrite path)."""

    def test_clear_column_and_mutations_rebuild_mvs(self, engine):
        engine.execute(
            "CREATE TABLE r12_src (k Int64, v Int64, tag String) "
            "ENGINE = MergeTree ORDER BY k"
        )
        try:
            engine.execute(
                "INSERT INTO r12_src VALUES (1, 10, 'a'), "
                "(2, 20, 'b'), (3, 30, 'a')"
            )
            engine.execute(
                "CREATE MATERIALIZED VIEW r12_mv AS SELECT tag, "
                "sum(v) AS sv FROM r12_src GROUP BY tag"
            )
            assert engine.execute(
                "SELECT * FROM r12_mv ORDER BY tag"
            ).rows == [["a", 40], ["b", 20]]
            # CLEAR COLUMN resets to type default AND dependents see it
            engine.execute("ALTER TABLE r12_src CLEAR COLUMN v")
            assert engine.execute(
                "SELECT * FROM r12_mv ORDER BY tag"
            ).rows == [["a", 0], ["b", 0]]
            # UPDATE mutation propagates too
            engine.execute(
                "ALTER TABLE r12_src UPDATE tag = 'z' WHERE k = 1"
            )
            assert engine.execute(
                "SELECT * FROM r12_mv ORDER BY tag"
            ).rows == [["a", 0], ["b", 0], ["z", 0]]
        finally:
            engine.execute("DROP VIEW IF EXISTS r12_mv")
            engine.execute("DROP TABLE IF EXISTS r12_src")

    def test_bloom_property_survives_rewrite_paths(self, engine):
        """The parquet no-dictionary bloom-column property must hold
        on every file the mutation/OPTIMIZE whole-part rewrites
        produce, not just the first MATERIALIZE write."""
        import glob
        import os

        import pyarrow.parquet as pq

        engine.execute(
            "CREATE TABLE r12_bl (k Int64, v Int64, tag String) "
            "ENGINE = MergeTree ORDER BY k"
        )
        try:
            engine.execute(
                "INSERT INTO r12_bl VALUES (1, 10, 'a'), "
                "(2, 20, 'b'), (3, 30, 'a')"
            )
            engine.execute(
                "ALTER TABLE r12_bl ADD INDEX bf_tag tag "
                "TYPE bloom_filter GRANULARITY 1"
            )
            engine.execute("ALTER TABLE r12_bl MATERIALIZE INDEX bf_tag")

            def tag_dictless():
                path = engine._attached["r12_bl"][0]
                local = (
                    path[7:] if path.startswith("file://") else path
                )
                flags = set()
                for f in glob.glob(
                    local + "/**/*.parquet", recursive=True
                ):
                    if os.path.getsize(f) == 0:
                        continue
                    md = pq.ParquetFile(f).metadata
                    for g in range(md.num_row_groups):
                        for c in range(md.num_columns):
                            col = md.row_group(g).column(c)
                            if col.path_in_schema == "tag":
                                flags.add(
                                    "PLAIN_DICTIONARY"
                                    not in col.encodings
                                    and "RLE_DICTIONARY"
                                    not in col.encodings
                                )
                return flags

            assert tag_dictless() == {True}
            engine.execute("ALTER TABLE r12_bl DELETE WHERE k = 2")
            assert tag_dictless() == {True}
            engine.execute("OPTIMIZE TABLE r12_bl FINAL")
            assert tag_dictless() == {True}
            engine.execute(
                "ALTER TABLE r12_bl UPDATE v = v + 1 WHERE k = 1"
            )
            assert tag_dictless() == {True}
            engine.execute("INSERT INTO r12_bl VALUES (9, 90, 'q')")
            assert tag_dictless() == {True}
            assert engine.execute(
                "SELECT k FROM r12_bl ORDER BY k"
            ).rows == [[1], [3], [9]]
        finally:
            engine.execute("DROP TABLE IF EXISTS r12_bl")


class TestRound12StatementSweep2:
    """Second statement-surface probe: introspection spellings a
    migrating CH user hits on day one (SHOW ENGINES, EXISTS
    DATABASE, DATABASE(), CH-shaped system.settings, IF EXISTS on
    DROP/TRUNCATE)."""

    @pytest.fixture
    def eng(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        return BigHouseEngine(spark)

    def test_database_alias(self, eng):
        assert eng.execute("SELECT DATABASE() AS d").rows == [["default"]]
        assert eng.execute("SELECT database() AS d").rows == [["default"]]

    def test_exists_database(self, eng):
        assert eng.execute("EXISTS DATABASE default").rows == [[1]]
        assert eng.execute("EXISTS DATABASE system").rows == [[1]]
        assert eng.execute("EXISTS DATABASE nope").rows == [[0]]

    def test_show_engines(self, eng):
        rows = eng.execute("SHOW ENGINES").rows
        names = {r[0] for r in rows}
        assert {"MergeTree", "Memory", "Null"} <= names

    def test_settings_view_ch_shape(self, eng):
        eng.execute("SET max_result_rows = 123")
        r = eng.execute(
            "SELECT name, value, changed FROM system.settings "
            "WHERE name = 'max_result_rows'"
        ).rows
        assert r == [["max_result_rows", "123", 1]]
        # SHOW [CHANGED] SETTINGS filters on the CH column
        assert eng.execute(
            "SHOW CHANGED SETTINGS LIKE 'max_result%'"
        ).rows[0][:2] == ["max_result_rows", "123"]

    def test_drop_truncate_if_exists(self, eng):
        assert eng.execute("TRUNCATE TABLE IF EXISTS __nope").rows == []
        assert eng.execute("DROP TABLE IF EXISTS __nope").rows == []
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown table"):
            eng.execute("DROP TABLE __nope")
        with _pytest.raises(ValueError, match="unknown table"):
            eng.execute("TRUNCATE TABLE __nope")


class TestInsertColumnLists:
    """CH partial-column INSERT: an explicit column list fills the
    omitted columns with NULL for Nullable-declared columns and CH
    TYPE DEFAULTS (0 / '' / 1970-01-01) for non-Nullable ones; the
    FORMAT payload forms accept the list too, and JSONEachRow casts
    string dates to the table's DATE/TIMESTAMP columns."""

    @pytest.fixture
    def eng(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        eng.execute(
            "CREATE TABLE IF NOT EXISTS __icl "
            "(k Int64, v Nullable(String), d Date) "
            "ENGINE = MergeTree ORDER BY k"
        )
        eng.execute("TRUNCATE TABLE __icl")
        return eng

    def test_values_with_column_list(self, eng):
        import datetime

        eng.execute("INSERT INTO __icl (k, d) VALUES (3, '2024-01-03')")
        assert eng.execute(
            "SELECT k, v, d FROM __icl"
        ).rows == [[3, None, datetime.date(2024, 1, 3)]]
        # reordered list
        eng.execute("INSERT INTO __icl (d, k) VALUES ('2024-01-04', 4)")
        assert eng.execute(
            "SELECT k FROM __icl WHERE d = '2024-01-04'"
        ).rows == [[4]]

    def test_type_default_fill_for_non_nullable(self, eng):
        import datetime

        eng.execute("INSERT INTO __icl (v) VALUES ('only')")
        assert eng.execute(
            "SELECT k, d FROM __icl WHERE v = 'only'"
        ).rows == [[0, datetime.date(1970, 1, 1)]]

    def test_format_payloads_with_column_list(self, eng):
        import datetime

        eng.execute(
            'INSERT INTO __icl (k, v) FORMAT JSONEachRow '
            '{"k": 22, "v": "pj"}'
        )
        assert eng.execute(
            "SELECT v, d FROM __icl WHERE k = 22"
        ).rows == [["pj", datetime.date(1970, 1, 1)]]
        eng.execute("INSERT INTO __icl (k) FORMAT Values (30)")
        assert eng.execute(
            "SELECT v, d FROM __icl WHERE k = 30"
        ).rows == [[None, datetime.date(1970, 1, 1)]]
        eng.execute(
            'INSERT INTO __icl (k, v, d) FORMAT CSV 21,"c",2024-03-02'
        )
        assert eng.execute(
            "SELECT v FROM __icl WHERE k = 21"
        ).rows == [["c"]]

    def test_jsoneachrow_casts_string_dates(self, eng):
        import datetime

        eng.execute(
            'INSERT INTO __icl FORMAT JSONEachRow '
            '{"k": 20, "v": "j", "d": "2024-03-01"}'
        )
        assert eng.execute(
            "SELECT d FROM __icl WHERE k = 20"
        ).rows == [[datetime.date(2024, 3, 1)]]

    def test_unknown_column_raises(self, eng):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown column"):
            eng.execute("INSERT INTO __icl (k, nope) VALUES (1, 2)")


class TestAliasInWhere:
    """CH resolves select-list aliases inside WHERE (day-one
    migration idiom); Spark only in GROUP BY/HAVING/ORDER BY. The
    engine retries UNRESOLVED_COLUMN failures with the alias
    expression substituted into the WHERE tail. A name Spark CAN
    resolve (real source column) never triggers the fallback —
    unlike CH's default alias-shadowing, the source column wins
    (documented in the fallback's docstring)."""

    @pytest.fixture
    def eng(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        return BigHouseEngine(spark)

    def test_alias_resolves_in_where(self, eng):
        assert eng.execute(
            "SELECT toString(number) AS s FROM numbers(12) "
            "WHERE match(s, '^1') ORDER BY s"
        ).rows == [["1"], ["10"], ["11"]]
        assert eng.execute(
            "SELECT number * 2 AS d FROM numbers(5) WHERE d > 4 "
            "ORDER BY d"
        ).rows == [[6], [8]]

    def test_multiple_aliases_in_where(self, eng):
        assert eng.execute(
            "SELECT number + 1 AS a, number * 2 AS b FROM numbers(5) "
            "WHERE a > 2 AND b < 8 ORDER BY a"
        ).rows == [[3, 4], [4, 6]]

    def test_alias_in_where_subquery_position(self, eng):
        assert eng.execute(
            "SELECT number * 3 AS t FROM numbers(5) "
            "WHERE t IN (SELECT 6)"
        ).rows == [[6]]

    def test_source_column_wins_over_alias(self, eng):
        assert eng.execute(
            "SELECT number * 10 AS number FROM numbers(3) "
            "WHERE number = 1 ORDER BY 1"
        ).rows == [[10]]

    def test_unknown_name_still_raises(self, eng):
        import pytest as _pytest

        with _pytest.raises(Exception, match="UNRESOLVED_COLUMN"):
            eng.execute("SELECT number FROM numbers(3) WHERE nope = 1")

    # -- round-13: quote-masked, scope-restricted substitution ------
    # (r12 judge reproduction: the retry rewrote same-named text
    # INSIDE WHERE string literals — silent wrong rows.)

    def test_alias_name_inside_where_literal_survives(self, eng):
        # `s LIKE 's1%'`: the alias resolves, the literal keeps its
        # spelling (the corrupted form matches nothing → 0 rows)
        assert eng.execute(
            "SELECT concat('s', toString(number)) AS s "
            "FROM numbers(12) WHERE s LIKE 's1%' ORDER BY s"
        ).rows == [["s1"], ["s10"], ["s11"]]

    def test_where_keyword_inside_literal_not_a_clause(self, eng):
        # the literal holds both a fake WHERE and the alias name;
        # neither is SQL — the real clause is located quote-masked
        assert eng.execute(
            "SELECT concat('x', toString(number)) AS s "
            "FROM numbers(3) WHERE s != 'no WHERE s here' ORDER BY s"
        ).rows == [["x0"], ["x1"], ["x2"]]

    def test_cte_inner_where_not_the_outer_clause(self, eng):
        # the CTE body's WHERE is depth>0; the alias substitutes in
        # the OUTER query's WHERE only
        assert eng.execute(
            "WITH t AS (SELECT number FROM numbers(10) "
            "WHERE number < 5) "
            "SELECT number * 2 AS d FROM t WHERE d > 4 ORDER BY d"
        ).rows == [[6], [8]]

    def test_alias_definition_in_subquery_untouched(self, eng):
        # `AS v` inside the IN-subquery is a DEFINITION at depth>0 —
        # never rewritten by the depth-0 substitution
        assert eng.execute(
            "SELECT number + 100 AS v FROM numbers(3) "
            "WHERE v IN (SELECT number + 100 AS v FROM numbers(2)) "
            "ORDER BY v"
        ).rows == [[100], [101]]

    def test_alias_in_prewhere_and_qualify(self, eng):
        # PREWHERE folds to WHERE before the retry; QUALIFY aliases
        # are Spark-native — both compose with the fallback
        assert eng.execute(
            "SELECT number * 2 AS d FROM numbers(5) PREWHERE d > 4 "
            "ORDER BY d"
        ).rows == [[6], [8]]
        assert eng.execute(
            "SELECT number AS n, row_number() OVER (ORDER BY number) "
            "AS r FROM numbers(5) QUALIFY r <= 2"
        ).rows == [[0, 1], [1, 2]]


class TestRound13PartitionedWrites:
    """Round-13 probe findings on partitioned tables.

    The big one: Spark's partition discovery lists partition columns
    LAST in the read schema, and every positional INSERT path aligned
    to THAT order — so any append AFTER the first insert into a
    partitioned table silently TRANSPOSED columns
    (``INSERT INTO t VALUES (1, 15)`` landed as k=15, v=1).
    ``_target_schema`` restores the declared CH column order from the
    recorded DDL. Plus the CH partition-scoped maintenance forms:
    ``ALTER ... UPDATE/DELETE ... IN PARTITION p WHERE c`` and
    ``OPTIMIZE TABLE ... PARTITION p``."""

    @pytest.fixture
    def eng(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        eng.execute("DROP TABLE IF EXISTS __pt13")
        eng.execute(
            "CREATE TABLE __pt13 (k Int64, v Int64) "
            "ENGINE = MergeTree PARTITION BY k ORDER BY v"
        )
        eng.execute("INSERT INTO __pt13 VALUES (1, 10), (1, 20), (2, 30)")
        return eng

    def test_append_keeps_declared_column_order(self, eng):
        # the regression: this second insert transposed to k=15, v=1
        eng.execute("INSERT INTO __pt13 VALUES (1, 15)")
        assert eng.execute(
            "SELECT k, v FROM __pt13 ORDER BY k, v"
        ).rows == [[1, 10], [1, 15], [1, 20], [2, 30]]

    def test_all_positional_paths_keep_declared_order(self, eng):
        eng.execute("INSERT INTO __pt13 (v, k) VALUES (99, 3)")
        eng.execute("INSERT INTO __pt13 FORMAT CSV 4,50")
        eng.execute('INSERT INTO __pt13 FORMAT JSONEachRow '
                    '{"v": 60, "k": 5}')
        eng.execute("INSERT INTO __pt13 SELECT 7, 70")
        assert eng.execute(
            "SELECT k, v FROM __pt13 WHERE k >= 3 ORDER BY k"
        ).rows == [[3, 99], [4, 50], [5, 60], [7, 70]]

    def test_update_in_partition(self, eng):
        eng.execute(
            "ALTER TABLE __pt13 UPDATE v = v + 1 "
            "IN PARTITION '1' WHERE v >= 10"
        )
        assert eng.execute(
            "SELECT k, v FROM __pt13 ORDER BY k, v"
        ).rows == [[1, 11], [1, 21], [2, 30]]

    def test_delete_in_partition(self, eng):
        # the WHERE matches rows in BOTH partitions; IN PARTITION
        # restricts the delete to one
        eng.execute(
            "ALTER TABLE __pt13 DELETE IN PARTITION 1 WHERE v >= 10"
        )
        assert eng.execute(
            "SELECT k, v FROM __pt13 ORDER BY k, v"
        ).rows == [[2, 30]]

    def test_optimize_partition_scopes_compaction(self, eng):
        eng.execute("INSERT INTO __pt13 VALUES (1, 15)")
        r = eng.execute("OPTIMIZE TABLE __pt13 PARTITION '1' FINAL")
        assert r.cols == ["path", "files_before", "files_after"]
        assert r.rows[0][1] >= 2 and r.rows[0][2] == 1
        assert eng.execute(
            "SELECT k, v FROM __pt13 ORDER BY k, v"
        ).rows == [[1, 10], [1, 15], [1, 20], [2, 30]]

    def test_optimize_partition_deduplicate(self, eng):
        eng.execute("INSERT INTO __pt13 VALUES (2, 30)")
        eng.execute("OPTIMIZE TABLE __pt13 PARTITION 2 FINAL DEDUPLICATE")
        assert eng.execute(
            "SELECT k, v FROM __pt13 WHERE k = 2"
        ).rows == [[2, 30]]

    def test_unknown_partition_raises(self, eng):
        with pytest.raises(ValueError, match="no such partition"):
            eng.execute("OPTIMIZE TABLE __pt13 PARTITION '9'")

    def test_unpartitioned_table_refuses_with_guidance(self, eng):
        eng.execute(
            "CREATE TABLE IF NOT EXISTS __pt13_flat (k Int64) "
            "ENGINE = Memory"
        )
        with pytest.raises(ValueError, match="not partitioned"):
            eng.execute(
                "ALTER TABLE __pt13_flat DELETE IN PARTITION '1' "
                "WHERE k = 1"
            )

    def test_in_partition_inside_literal_is_data(self, eng):
        assert eng.execute(
            "SELECT 'ALTER TABLE t DELETE IN PARTITION 1 WHERE x' AS s"
        ).rows == [["ALTER TABLE t DELETE IN PARTITION 1 WHERE x"]]


class TestRound13ColumnDdlOnRecordedSchema:
    """ALTER ADD/DROP/RENAME/MODIFY COLUMN on a table whose CREATE
    recorded a CH schema string: the records must track the DDL, or
    the re-attach after the storage rewrite pins the PRE-ALTER
    schema (round-13 probe: an added column was UNRESOLVED on read
    and positional INSERTs mis-sized)."""

    @pytest.fixture
    def eng(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        eng.execute("DROP TABLE IF EXISTS __cd13")
        eng.execute(
            "CREATE TABLE __cd13 (k Int64, v Int64) "
            "ENGINE = MergeTree PARTITION BY k ORDER BY v"
        )
        eng.execute("INSERT INTO __cd13 VALUES (1, 10)")
        return eng

    def test_add_column_readable_and_insertable(self, eng):
        eng.execute("ALTER TABLE __cd13 ADD COLUMN s String DEFAULT 'd'")
        assert eng.execute(
            "SELECT k, v, s FROM __cd13"
        ).rows == [[1, 10, "d"]]
        # positional insert sees the post-ALTER declared order
        eng.execute("INSERT INTO __cd13 VALUES (2, 20, 'x')")
        assert eng.execute(
            "SELECT k, v, s FROM __cd13 ORDER BY k"
        ).rows == [[1, 10, "d"], [2, 20, "x"]]

    def test_drop_rename_modify_track_records(self, eng):
        eng.execute("ALTER TABLE __cd13 ADD COLUMN s String DEFAULT 'd'")
        eng.execute("ALTER TABLE __cd13 MODIFY COLUMN v Float64")
        eng.execute("ALTER TABLE __cd13 RENAME COLUMN s TO t")
        assert eng.execute(
            "SELECT k, v, t FROM __cd13"
        ).rows == [[1, 10.0, "d"]]
        eng.execute("ALTER TABLE __cd13 DROP COLUMN t")
        eng.execute("INSERT INTO __cd13 VALUES (3, 30)")
        assert eng.execute(
            "SELECT k, v FROM __cd13 ORDER BY k"
        ).rows == [[1, 10.0], [3, 30.0]]


class TestRound13ExchangeKeepsDeclaredOrder:
    """EXCHANGE TABLES / RENAME TABLE must move the declared-order
    record (`_ch_col_ddl`) with the table — left behind, the first
    positional INSERT into an exchanged partitioned table read a
    STALE column order and transposed values (round-13 probe)."""

    def test_insert_after_exchange(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        for t in ("__xk13a", "__xk13b"):
            eng.execute(f"DROP TABLE IF EXISTS {t}")
        eng.execute(
            "CREATE TABLE __xk13a (k Int64, v Int64) "
            "ENGINE = MergeTree PARTITION BY k ORDER BY v"
        )
        eng.execute(
            "CREATE TABLE __xk13b (s String, n Int64) ENGINE = Memory"
        )
        eng.execute("INSERT INTO __xk13a VALUES (1, 10)")
        eng.execute("INSERT INTO __xk13b VALUES ('a', 1)")
        eng.execute("EXCHANGE TABLES __xk13a AND __xk13b")
        eng.execute("INSERT INTO __xk13b VALUES (2, 20)")
        assert eng.execute(
            "SELECT k, v FROM __xk13b ORDER BY k"
        ).rows == [[1, 10], [2, 20]]
        eng.execute("INSERT INTO __xk13a VALUES ('b', 2)")
        assert eng.execute(
            "SELECT s, n FROM __xk13a ORDER BY s"
        ).rows == [["a", 1], ["b", 2]]

    def test_insert_after_rename(self, spark):
        from bighouse_spark.engine import BigHouseEngine

        eng = BigHouseEngine(spark)
        for t in ("__rk13a", "__rk13b"):
            eng.execute(f"DROP TABLE IF EXISTS {t}")
        eng.execute(
            "CREATE TABLE __rk13a (k Int64, v Int64) "
            "ENGINE = MergeTree PARTITION BY k ORDER BY v"
        )
        eng.execute("INSERT INTO __rk13a VALUES (1, 10)")
        eng.execute("RENAME TABLE __rk13a TO __rk13b")
        eng.execute("INSERT INTO __rk13b VALUES (2, 20)")
        assert eng.execute(
            "SELECT k, v FROM __rk13b ORDER BY k"
        ).rows == [[1, 10], [2, 20]]
