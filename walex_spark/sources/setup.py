"""Test-database bootstrap / teardown — parity with the reference's
mix tasks (lib/mix/tasks/walex.setup.ex:38-186, walex.drop.ex:1-17,
helpers.ex:1-44), the last unmirrored reference surface.

The mix tasks are imperative Postgrex calls; here the same bootstrap
is DATA — ordered SQL statement lists a caller can execute over any
connection (psycopg2, JDBC, psql) or just print. The statement
CONTENT and ORDER mirror the reference exactly:

  setup:  citext + uuid-ossp extensions, updated_at trigger function,
          "user" table + trigger, todo table + trigger, seeds (5 users,
          15 todos), wal_level=logical, the `events` publication for
          ("user", "todo"), REPLICA IDENTITY FULL on both.
  drop:   DROP DATABASE.

``main()`` is the mix-task analog: ``python -m walex_spark.sources.setup
[--dsn postgresql://...] [--drop]`` executes against a live server when
psycopg2 is importable (the RUNBOOK.md path) and prints the statements
otherwise — the sandbox has no Postgres, so printing is the default
observable behavior and the statement lists are what the tests pin.
"""

from __future__ import annotations

TEST_DATABASE = "todos_test"  # walex.setup.ex:8

CREATE_DATABASE = f"CREATE DATABASE {TEST_DATABASE};"
DROP_DATABASE = f"DROP DATABASE {TEST_DATABASE};"

_UPDATED_AT_FUNCTION = """\
CREATE OR REPLACE FUNCTION set_current_timestamp_updated_at()
RETURNS TRIGGER AS $$
DECLARE
  _new record;
BEGIN
  _new := NEW;
  _new."updated_at" = NOW();
  RETURN _new;
END;
$$ LANGUAGE plpgsql;"""

_USER_TABLE = """\
CREATE TABLE "user" (
  id SERIAL PRIMARY KEY,
  email citext UNIQUE NOT NULL,
  name VARCHAR  NOT NULL,
  age INTEGER DEFAULT 0,
  books VARCHAR[] DEFAULT '{}'::VARCHAR[],
  favorite_numbers INTEGER[] DEFAULT '{}'::INTEGER[],
  meta JSONB DEFAULT '{}'::JSONB,
  created_at TIMESTAMPTZ DEFAULT NOW(),
  updated_at TIMESTAMPTZ DEFAULT NOW()
);"""

_TODO_TABLE = """\
CREATE TABLE todo (
  id UUID DEFAULT uuid_generate_v4() PRIMARY KEY,
  user_id INTEGER REFERENCES "user"(id) ON DELETE CASCADE,
  description TEXT NOT NULL,
  due_date DATE,
  is_completed BOOLEAN DEFAULT FALSE,
  priority INTEGER DEFAULT 0,
  tags VARCHAR[] DEFAULT '{}'::VARCHAR[],
  rules JSONB,
  created_at TIMESTAMPTZ DEFAULT NOW(),
  updated_at TIMESTAMPTZ DEFAULT NOW()
);"""

_SEED_USERS = """\
INSERT INTO "user" (email, name, age)
VALUES
  ('john.doe@example.com', 'John Doe', 28),
  ('jane.smith@example.com', 'Jane Smith', 32),
  ('bob.jones@example.com', 'Bob Jones', 25),
  ('alice.davis@example.com', 'Alice Davis', 34),
  ('charlie.brown@example.com', 'Charlie Brown', 30);"""

_SEED_TODOS = """\
INSERT INTO todo (user_id, description, due_date, is_completed, priority, tags, rules)
VALUES
  (1, 'Buy groceries', '2023-01-10', false, 2, ARRAY['groceries', 'shopping'], '{"reminder": true, "repeat": "weekly"}'::JSONB),
  (1, 'Finish work project', '2023-01-15', true, 1, ARRAY['work', 'project'], '{"priority": "high"}'::JSONB),
  (1, 'Exercise', NULL, false, 3, ARRAY['health', 'fitness'], '{}'::JSONB),
  (2, 'Read a book', '2023-02-01', true, 2, ARRAY['reading', 'books'], '{"genre": "mystery"}'::JSONB),
  (2, 'Write a blog post', '2023-02-10', false, 1, ARRAY['writing', 'blog'], '{"format": "tutorial"}'::JSONB),
  (2, 'Plan vacation', '2023-03-01', false, 3, ARRAY['travel', 'vacation'], '{"destination": "beach"}'::JSONB),
  (3, 'Learn a new programming language', '2023-01-20', false, 2, ARRAY['coding', 'programming'], '{"level": "intermediate"}'::JSONB),
  (3, 'Cook a new recipe', '2023-02-05', false, 1, ARRAY['cooking', 'recipe'], '{"cuisine": "Italian"}'::JSONB),
  (3, 'Study for exams', '2023-02-28', true, 3, ARRAY['education', 'exams'], '{"subject": "math"}'::JSONB),
  (4, 'Explore hiking trails', NULL, true, 2, ARRAY['outdoors', 'hiking'], '{}'::JSONB),
  (4, 'Complete home improvement projects', '2023-03-15', true, 1, ARRAY['home', 'projects'], '{"room": "kitchen"}'::JSONB),
  (4, 'Attend a music concert', '2023-04-01', false, 3, ARRAY['music', 'concert'], '{"genre": "rock"}'::JSONB),
  (5, 'Volunteer at local community center', '2023-02-10', false, 2, ARRAY['community', 'volunteer'], '{"activity": "food drive"}'::JSONB),
  (5, 'Practice mindfulness', NULL, false, 1, ARRAY['mindfulness', 'meditation'], '{}'::JSONB),
  (5, 'Attend a language exchange meetup', '2023-03-05', true, 3, ARRAY['language', 'meetup'], '{"languages": ["Spanish", "French"]}'::JSONB);"""


def create_extension(extension: str) -> str:
    """helpers.ex:22-26 (CREATE EXTENSION IF NOT EXISTS)."""
    return f'CREATE EXTENSION IF NOT EXISTS "{extension}";'


def create_updated_at_trigger(table_name: str) -> str:
    """walex.setup.ex:88-96 — per-table BEFORE UPDATE trigger."""
    return (
        f'CREATE TRIGGER set_{table_name}_updated_at\n'
        f'BEFORE UPDATE ON "{table_name}"\n'
        "FOR EACH ROW\n"
        "EXECUTE PROCEDURE set_current_timestamp_updated_at();"
    )


def set_replica_identity(table_name: str) -> str:
    """walex.setup.ex:63-67."""
    return f'ALTER TABLE "{table_name}" REPLICA IDENTITY FULL;'


def setup_statements() -> list[str]:
    """The full setup sequence in the reference's execution order
    (walex.setup.ex:24-48: logic -> tables -> seeds -> replication)."""
    return [
        create_extension("citext"),
        create_extension("uuid-ossp"),
        _UPDATED_AT_FUNCTION,
        _USER_TABLE,
        create_updated_at_trigger("user"),
        _TODO_TABLE,
        create_updated_at_trigger("todo"),
        _SEED_USERS,
        _SEED_TODOS,
        "ALTER SYSTEM SET wal_level = 'logical';",
        'CREATE PUBLICATION events FOR TABLE "user", "todo";',
        set_replica_identity("user"),
        set_replica_identity("todo"),
    ]


def drop_statements() -> list[str]:
    """walex.drop.ex — teardown is just the database drop."""
    return [DROP_DATABASE]


def maintenance_dsn(dsn: str) -> str:
    """Rewrite a DSN's database path to the ``postgres`` maintenance
    database. ``DROP DATABASE`` cannot run from a connection open on the
    database being dropped, so the --drop path must NOT connect with the
    same DSN the setup used (the reference's helpers drop via psql
    against the default database — test_helpers.exs). Key=value DSNs
    rewrite the ``dbname`` token; URL DSNs rewrite the path."""
    if "://" not in dsn:  # key=value form: dbname=todos_test host=...
        import re

        if re.search(r"\bdbname=\S+", dsn):
            return re.sub(r"\bdbname=\S+", "dbname=postgres", dsn)
        return (dsn + " dbname=postgres").strip()
    from urllib.parse import urlsplit, urlunsplit

    parts = urlsplit(dsn)
    return urlunsplit(parts._replace(path="/postgres"))


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="walex.setup / walex.drop mix-task analog"
    )
    ap.add_argument("--dsn", help="execute against this Postgres DSN")
    ap.add_argument("--drop", action="store_true", help="teardown instead")
    args = ap.parse_args(argv)
    stmts = drop_statements() if args.drop else setup_statements()
    if not args.dsn:
        for s in stmts:
            print(s)
        return 0
    try:
        import psycopg2
    except ImportError:
        raise SystemExit("psycopg2 not installed — see RUNBOOK.md")
    # --drop must connect to the maintenance DB: Postgres refuses to
    # drop the database the connection is open on
    conn = psycopg2.connect(
        maintenance_dsn(args.dsn) if args.drop else args.dsn
    )
    conn.autocommit = True
    with conn.cursor() as cur:
        for s in stmts:
            cur.execute(s)
    conn.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
