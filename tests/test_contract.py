

class TestOracleHygiene:
    def test_every_oracle_parses_in_duckdb(self):
        """EXPLAIN every registered oracle against empty-schema views: a
        syntax error or unknown column fails HERE in seconds instead of
        a hash-mismatch deep in the 25-minute battery. (Execution-level
        correctness stays with tools/check_oracles.py / the driver.)"""
        import duckdb

        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            get_oracles,
        )

        con = duckdb.connect()
        sf = "/root/testdata/sf0.001"
        for tbl in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{sf}/{tbl}.parquet'"
            )
        bad = []
        for name, sql in get_oracles().items():
            try:
                con.execute(f"EXPLAIN {sql}")
            except Exception as exc:
                bad.append((name, str(exc)[:120]))
        assert not bad, bad

    def test_every_query_has_doc(self):
        from spark_sql_custom_mq_datasource_spark.plans.registry import (
            QUERIES,
            get_queries,
        )

        get_queries()
        undocumented = [n for n, q in QUERIES.items() if not q.doc.strip()]
        assert undocumented == []
