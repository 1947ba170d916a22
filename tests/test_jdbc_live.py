"""LIVE end-to-end JDBC polling tests against embedded Apache Derby.

Rounds 1-3 exercised JdbcPollingSource only through its cursor /
predicate string logic — the actual ``spark.read.format("jdbc")`` call
had never executed (no Postgres in the container). Spark ships the
Derby jars for its Hive metastore, so an embedded Derby database gives
the real reader path — driver resolution, pushdown subquery syntax,
partitioned bounds, incremental poll→commit→poll — without any network
or install. The reference's flagship tests run real logical replication
(test/walex/event/event_test.exs:37-92); this is the closest faithful
analog Spark-side in this container.
"""

import pytest

from walex_spark.sources.jdbc import JdbcPollingSource

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """An embedded Derby DB with a `changes` table, created through the
    same JVM Spark runs in (no second process needed)."""
    db_dir = str(tmp_path_factory.mktemp("derby") / "walexdb")
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    # route derby.log away from the repo root
    jvm.java.lang.System.setProperty(
        "derby.stream.error.field", "java.lang.System.err"
    )
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE changes (lsn BIGINT PRIMARY KEY, op VARCHAR(10), "
        "tbl VARCHAR(30), val DOUBLE)"
    )
    for i in range(1, 21):
        st.executeUpdate(
            f"INSERT INTO changes VALUES ({i}, "
            f"'{'insert' if i % 3 else 'update'}', 'orders', {i * 1.5})"
        )
    yield {"url": url, "conn": conn, "st": st}
    st.close()
    conn.close()


def _source(derby, tmp_path=None) -> JdbcPollingSource:
    return JdbcPollingSource(
        url=derby["url"],
        table="changes",
        cursor_col="lsn",
        driver=DRIVER,
        num_partitions=4,
        checkpoint_path=str(tmp_path / "ckpt") if tmp_path else None,
    )


def test_full_poll_reads_all_rows(spark, derby):
    df = _source(derby).poll(spark)
    rows = sorted(r.LSN for r in df.collect())
    assert rows == list(range(1, 21))
    assert set(c.upper() for c in df.columns) == {"LSN", "OP", "TBL", "VAL"}


def test_cursor_predicate_pushes_down(spark, derby):
    src = _source(derby)
    src.commit(15)
    df = src.poll(spark)
    assert sorted(r.LSN for r in df.collect()) == [16, 17, 18, 19, 20]


def test_partitioned_poll_matches_unpartitioned(spark, derby):
    """With both bounds the read splits into num_partitions JDBC range
    queries; the union must equal the single-partition result."""
    src = _source(derby)
    src.commit(5)
    df = src.poll(spark, upper_bound=20)
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r.LSN for r in df.collect()) == list(range(6, 21))


def test_probe_max_round_trip(spark, derby):
    src = _source(derby)
    probe = (
        spark.read.format("jdbc")
        .option("url", derby["url"])
        .option("driver", DRIVER)
        .option("dbtable", src.probe_max_sql())
        .load()
    )
    assert probe.collect()[0][0] == 20


def test_incremental_poll_commit_poll(spark, derby, tmp_path):
    """The full CDC loop: poll, advance the durable cursor from the
    batch, new rows land, next poll sees ONLY the new rows, and a
    restarted source resumes from the persisted checkpoint."""
    src = _source(derby, tmp_path)
    src.commit(20)  # everything so far is consumed
    assert src.poll(spark).count() == 0
    for i in (21, 22):
        derby["st"].executeUpdate(
            f"INSERT INTO changes VALUES ({i}, 'delete', 'orders', {i * 1.5})"
        )
    batch = src.poll(spark)
    assert sorted(r.LSN for r in batch.collect()) == [21, 22]
    src.advance_from(batch)
    assert src.cursor == 22
    # a NEW source instance (fresh process analog) resumes at 22
    resumed = _source(derby, tmp_path)
    assert resumed.cursor == 22
    assert resumed.poll(spark).count() == 0
