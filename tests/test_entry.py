"""Smoke the driver contract: entry(), every queries() entry, oracle keys."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["user_id", "last_event_id", "last_event_type", "last_value"]


def test_all_queries_run_sf0001(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    # every query has an oracle — seeded-hash ops use engine-portable md5
    # hashing so even they are SQL-checkable
    assert qs - os_ == set()


def test_oracle_match_sf0001(spark):
    """Fast local replica of the driver's check at sf0.001 (full run at
    sf0.01 via tools/check_oracle.py)."""
    import duckdb

    from tools.check_oracle import TABLES, value_hash

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        assert len(sdf) == len(odf), name
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert value_hash(sdf) == value_hash(odf), name
