"""JDBC layer integration tests against embedded Derby (bundled with
pyspark) — the analogue of the reference's t/DB.t live-database suite."""

import pytest

from etl_wrap_spark.sources import jdbc


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/testdb;create=true"
    jdbc.execute(spark, url, "CREATE TABLE target (id1 INT NOT NULL, id2 VARCHAR(10) NOT NULL, name VARCHAR(50), num DOUBLE, PRIMARY KEY (id1, id2))")
    jdbc.execute(spark, url, "CREATE TABLE target_stage (id1 INT, id2 VARCHAR(10), name VARCHAR(50), num DOUBLE)")
    jdbc.execute(spark, url, "CREATE TABLE target_delstage (id1 INT, id2 VARCHAR(10))")
    return url


def test_write_and_read_query(spark, db):
    df = spark.createDataFrame(
        [(1, "A", "first", 1234.56), (2, "B", "second", -7.5)],
        ["id1", "id2", "name", "num"],
    )
    jdbc.write_table(df, db, "target")
    back = jdbc.read_query(spark, db, "SELECT id1, id2, name, num FROM target")
    assert sorted((r["ID1"], r["NAME"]) for r in back.collect()) == [(1, "first"), (2, "second")]


def test_upsert_merge(spark, db):
    # the reference's canonical test scenario (t/DB.t:30-48): re-store
    # with one changed and one new row, keyed on (id1, id2)
    upd = spark.createDataFrame(
        [(1, "A", "first-updated", 99.0), (3, "C", "third", 3.0)],
        ["id1", "id2", "name", "num"],
    )
    jdbc.staged_upsert(upd, db, "target", keys=["id1", "id2"])
    rows = {
        (r["ID1"], r["ID2"]): (r["NAME"], r["NUM"])
        for r in jdbc.read_query(spark, db, "SELECT * FROM target").collect()
    }
    assert rows[(1, "A")] == ("first-updated", 99.0)  # matched → updated
    assert rows[(2, "B")] == ("second", -7.5)  # untouched
    assert rows[(3, "C")] == ("third", 3.0)  # not matched → inserted


def test_staged_delete(spark, db):
    keys = spark.createDataFrame([(2, "B")], ["id1", "id2"])
    jdbc.staged_delete(keys, db, "target", keys=["id1", "id2"])
    left = sorted(r["ID1"] for r in jdbc.read_query(spark, db, "SELECT id1 FROM target").collect())
    assert left == [1, 3]


def test_keyed_lookup_dedupes(spark, db):
    jdbc.execute(spark, db, "CREATE TABLE lk (k INT, v VARCHAR(5))")
    jdbc.write_table(
        spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"]), db, "lk"
    )
    lk = jdbc.read_keyed_lookup(spark, db, "SELECT k, v FROM lk", "K")
    assert lk.count() == 2


def test_execute_returns_result_sets(spark, db):
    rs = jdbc.execute(spark, db, "SELECT COUNT(*) FROM target")
    # rows (1,A) and (3,C) survive the earlier delete test
    assert len(rs) == 1 and rs[0][0][0] == 2


def test_parallel_partitioned_read(spark, db):
    df = jdbc.read_query(
        spark, db, "SELECT id1, num FROM target",
        partition_column="id1", lower_bound=0, upper_bound=10, num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 2
