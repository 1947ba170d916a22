"""Bootstrap-task parity pins (lib/mix/tasks/walex.setup.ex:38-186,
walex.drop.ex, helpers.ex) — statement content and ORDER are the
contract; execution is covered by the RUNBOOK path when a live
Postgres exists."""

from walex_spark.sources import setup as S


def test_setup_statement_order_mirrors_reference():
    stmts = S.setup_statements()
    # logic -> tables(+triggers) -> seeds -> replication, as in
    # setup_test_database/0's call order
    keys = [
        "citext", "uuid-ossp", "set_current_timestamp_updated_at",
        'CREATE TABLE "user"', "set_user_updated_at", "CREATE TABLE todo",
        "set_todo_updated_at", 'INSERT INTO "user"', "INSERT INTO todo",
        "wal_level", "CREATE PUBLICATION events",
    ]
    pos = [next(i for i, s in enumerate(stmts) if k in s) for k in keys]
    assert pos == sorted(pos), "bootstrap statements out of reference order"


def test_setup_matches_reference_details():
    stmts = S.setup_statements()
    joined = "\n".join(stmts)
    # extensions via IF NOT EXISTS (helpers.ex:22-26)
    assert 'CREATE EXTENSION IF NOT EXISTS "citext";' in stmts
    assert 'CREATE EXTENSION IF NOT EXISTS "uuid-ossp";' in stmts
    # publication lists exactly the two tables (walex.setup.ex:57-61)
    assert 'CREATE PUBLICATION events FOR TABLE "user", "todo";' in stmts
    # replica identity FULL on both (walex.setup.ex:63-67)
    assert 'ALTER TABLE "user" REPLICA IDENTITY FULL;' in stmts
    assert 'ALTER TABLE "todo" REPLICA IDENTITY FULL;' in stmts
    # wal_level mutation is ALTER SYSTEM, as in the task
    assert "ALTER SYSTEM SET wal_level = 'logical';" in stmts
    # seed cardinality: 5 users, 15 todos (walex.setup.ex:139-186)
    assert joined.count("@example.com") == 5
    assert joined.count("::JSONB),") + joined.count("::JSONB);") == 15
    # todo.id defaults to uuid_generate_v4 (needs the extension above)
    assert "uuid_generate_v4()" in joined


def test_drop_is_database_drop_only():
    assert S.drop_statements() == ["DROP DATABASE todos_test;"]


def test_cli_prints_without_dsn(capsys):
    assert S.main([]) == 0
    out = capsys.readouterr().out
    assert "CREATE PUBLICATION events" in out
    assert S.main(["--drop"]) == 0
    assert "DROP DATABASE todos_test;" in capsys.readouterr().out


def test_maintenance_dsn_rewrite():
    """--drop must not connect to the database it drops: URL and
    key=value DSNs both rewrite to the postgres maintenance DB."""
    from walex_spark.sources.setup import maintenance_dsn

    assert (
        maintenance_dsn("postgresql://u:p@localhost:5432/todos_test")
        == "postgresql://u:p@localhost:5432/postgres"
    )
    assert (
        maintenance_dsn("postgresql://u:p@h/todos_test?sslmode=require")
        == "postgresql://u:p@h/postgres?sslmode=require"
    )
    assert (
        maintenance_dsn("dbname=todos_test host=localhost user=postgres")
        == "dbname=postgres host=localhost user=postgres"
    )
    assert maintenance_dsn("host=localhost").endswith("dbname=postgres")
