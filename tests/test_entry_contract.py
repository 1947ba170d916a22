"""Driver-contract pins for __spark_entry__.py.

Round 1 lesson: the 18 extension queries were silently absent from
CORRECTNESS_r01.json because their oracles said `FROM documents` /
`FROM embeddings` — views the driver's DuckDB never registers
(TESTDATA.md lists only the 8 star-schema tables). These tests
replicate the driver's constrained oracle environment so a
regression fails CI instead of silently dropping queries from the
hard gate.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

# exactly what TESTDATA.md says the driver registers — nothing more
DRIVER_VIEWS = "region nation customer supplier part orders lineitem events".split()
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def driver_duck():
    con = duckdb.connect()
    for t in DRIVER_VIEWS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_query_has_callable_and_oracle_alignment():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query; the reverse may skip
    # (rows-only queries are allowed to omit the oracle)
    assert set(os_) <= set(qs)


@pytest.mark.parametrize(
    "name", sorted(entrymod.oracle_sql()), ids=lambda n: n
)
def test_oracle_runs_in_driver_duckdb(driver_duck, name):
    """Each driver-facing oracle must EXPLAIN cleanly with only the 8
    TESTDATA views registered — i.e. be self-contained for any other
    table it references."""
    sql = entrymod.oracle_sql()[name]
    driver_duck.execute(f"EXPLAIN {sql}")


def test_driver_window_rotation():
    """r12 window pin: the driver's hard gate reads only the first 50
    queries() entries. This round the three stale-mandatory queries
    head the window (q_quantiles / q_emb_cosine_topk / q_emb_ann_lsh —
    last hard row r07, red under test_stale_witnesses_are_in_window
    the moment r11's files landed), followed by the 16 r11-optimized
    queries with no driver row under the optimized code (r11 VERDICT
    item #3), the r12-touched queries, and the r08-stale cohort. The
    ordering must apply ONLY at the __spark_entry__ surface — the
    registry itself keeps natural declaration order for
    bench/profiler consumers."""
    from walex_spark.queries import DRIVER_ORDER, QUERIES

    window = list(entrymod.queries())[:50]
    assert window[: len(DRIVER_ORDER)] == DRIVER_ORDER
    # stale-mandatory queries head the window, non-negotiable
    assert window[:5] == [
        "q_quantiles", "q_emb_cosine_topk", "q_emb_ann_lsh",
        "q_cdc_pgoutput_decode", "q_doc_dup_spans",
    ]
    # registry keeps natural declaration order (no import-time mutation)
    assert list(QUERIES)[:2] == ["q01_pricing_summary", "q02_top_revenue_orders"]
    # oracle ordering mirrors query ordering for the shared keys
    os_head = [n for n in entrymod.oracle_sql() if n in set(window)][:50]
    assert os_head == [n for n in window if n in set(entrymod.oracle_sql())]


def test_self_contained_rewrite_preserves_aliases():
    """`FROM documents d JOIN ...` must keep the query's alias — the
    naive rewrite produced `read_parquet(...) AS documents d`, a parse
    error that silently failed the driver gate for that query."""
    f = entrymod._self_contained
    assert (
        f("FROM documents d JOIN r ON r.x = d.x")
        == f"FROM read_parquet('{SF_DIR}/documents.parquet') AS d JOIN r ON r.x = d.x"
    )
    assert (
        f("FROM documents AS dd WHERE x")
        == f"FROM read_parquet('{SF_DIR}/documents.parquet') AS dd WHERE x"
    )
    # keywords after the table are NOT aliases
    assert f("FROM documents WHERE x").startswith(
        f"FROM read_parquet('{SF_DIR}/documents.parquet') AS documents WHERE"
    )
    assert f("FROM documents\n    WINDOW w AS (x)").startswith(
        f"FROM read_parquet('{SF_DIR}/documents.parquet') AS documents WINDOW"
    )
    assert f("FROM documents)").startswith(
        f"FROM read_parquet('{SF_DIR}/documents.parquet') AS documents)"
    )
    # clause keywords that can directly follow `FROM <table>` must not
    # be swallowed as aliases (OFFSET 10 -> `AS offset 10` is a DuckDB
    # parse error the EXPLAIN gate would only catch after the fact)
    for kw in (
        "OFFSET 10",
        "FETCH FIRST 5 ROWS ONLY",
        "TABLESAMPLE BERNOULLI(10)",
        "PIVOT (SUM(x) FOR y IN ('a'))",
        "UNPIVOT (v FOR k IN (a, b))",
        "POSITIONAL JOIN t2",
    ):
        got = f(f"FROM documents {kw}")
        assert got.startswith(
            f"FROM read_parquet('{SF_DIR}/documents.parquet') AS documents {kw.split()[0]}"
        ), got


def test_extension_oracles_are_self_contained():
    os_ = entrymod.oracle_sql()
    ext = [n for n in os_ if n.startswith(("q_doc_", "q_emb_", "q_multimodal_"))]
    assert len(ext) >= 15
    for n in ext:
        sql = os_[n]
        assert "read_parquet" in sql, f"{n} still references a bare view"


def test_self_contained_rewrite_handles_join_position():
    """`JOIN documents d USING (...)` must substitute like the FROM
    spelling — the confusion-matrix oracle originally hit a DuckDB
    catalog error because only FROM-position tables were rewritten."""
    f = entrymod._self_contained
    got = f("FROM pred p JOIN documents d USING (doc_id)")
    assert (
        got
        == f"FROM pred p JOIN read_parquet('{SF_DIR}/documents.parquet') AS d USING (doc_id)"
    )
    got2 = f("FROM pred p JOIN documents USING (doc_id)")
    assert (
        got2
        == f"FROM pred p JOIN read_parquet('{SF_DIR}/documents.parquet') AS documents USING (doc_id)"
    )
