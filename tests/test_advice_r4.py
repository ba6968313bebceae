"""Round-4 ADVICE regression tests: cache max_size validation, DML keyword
rewriting (CAST .. AS INT), dup_clusters non-convergence warning, empty
streaming join partner, revision-id allocation after deletes, and the DML
replay-fallback warning."""

import os
import warnings

import pytest
from pyspark.sql import functions as F

from eventflux_engine_spark.sql.app import EventFluxApp


class TestCacheMaxSizeRequired:
    def test_missing_max_size_rejected(self, spark):
        # cache_table.rs:238: 'max_size property required'
        with pytest.raises(ValueError, match="max_size"):
            EventFluxApp(spark).execute(
                "CREATE TABLE T (id INT) WITH ('backend'='cache');"
            )

    def test_with_max_size_accepted(self, spark):
        app = EventFluxApp(spark).execute(
            "CREATE TABLE T (id INT) WITH ('backend'='cache', 'max_size'='3');"
        )
        assert app.streams["T"].options["max_size"] == "3"


class TestDmlKeywordRewrite:
    def test_cast_as_int_not_mangled(self):
        from eventflux_engine_spark.sql import dml_compile

        class D:
            table = "T"
            source = "S"
            source_alias = None

        out = dml_compile.rewrite("CAST(delta AS INT)", D(), ["qty"])
        assert out == "CAST(__s.delta AS INT)"
        out2 = dml_compile.rewrite(
            "CASE WHEN qty > 0 THEN CAST(delta AS BIGINT) ELSE 0 END",
            D(), ["qty"],
        )
        assert "__s.AS" not in out2 and "__t.qty" in out2

    def test_column_named_like_keyword_still_resolves(self):
        from eventflux_engine_spark.sql import dml_compile

        class D:
            table = "T"
            source = "S"
            source_alias = None

        # a real column named `day` must win over the INTERVAL-unit keyword
        out = dml_compile.rewrite("day + 1", D(), ["day"])
        assert out == "__t.day + 1"

    def test_cast_in_update_set_stays_compiled(self, spark):
        # end-to-end: a SET expression with CAST(.. AS ..) must compile to
        # the distributed plan (no replay warning) and compute correctly
        app = EventFluxApp(spark).execute(
            """
            CREATE TABLE Inv (item VARCHAR, qty INT);
            CREATE STREAM Adj (item VARCHAR, delta DOUBLE);
            UPDATE Inv SET qty = qty + CAST(delta AS INT)
              FROM Adj WHERE Inv.item = Adj.item;
            """
        )
        app.send("Inv", [("a", 10), ("b", 5)])
        app.send("Adj", [("a", 3.0), ("a", 2.0)])
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            state = app._table_state("Inv")
        got = {r["item"]: r["qty"] for r in state}
        assert got == {"a": 15, "b": 5}


class TestDupClustersConvergenceWarning:
    def test_warns_when_diameter_exceeds_max_iters(self, spark):
        from eventflux_engine_spark.dedup import dup_clusters

        # a chain 0-1-2-...-9 has diameter 9: hash-min cannot finish in 2
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
        )
        with pytest.warns(RuntimeWarning, match="did not converge"):
            dup_clusters(pairs, max_iters=2).collect()

    def test_no_warning_on_convergence(self, spark):
        from eventflux_engine_spark.dedup import dup_clusters

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (8, 9)], "doc_a long, doc_b long"
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            rows = {
                (r.doc_id, r.cluster_id)
                for r in dup_clusters(pairs, max_iters=10).collect()
            }
        assert rows == {(1, 1), (2, 1), (3, 1), (8, 8), (9, 8)}


class TestEmptyStreamJoinPartner:
    def test_streaming_inner_join_empty_partner_yields_empty(self, spark):
        # ADVICE: an empty partner stream must behave like the batch path
        # (zero INNER-join rows), not raise 'stream feed X has no events'
        app = EventFluxApp(spark).execute(
            """
            CREATE STREAM Trades (symbol VARCHAR, price DOUBLE);
            CREATE STREAM News (symbol VARCHAR, headline VARCHAR);
            CREATE STREAM Out (symbol VARCHAR, price DOUBLE, headline VARCHAR);
            INSERT INTO Out
            SELECT Trades.symbol, Trades.price, News.headline
            FROM Trades JOIN News ON Trades.symbol = News.symbol;
            """
        )
        app.send("Trades", [("AAPL", 190.0), ("MSFT", 310.0)])
        assert app.run("Out") == []
        assert app.run_streaming("Out") == []


class TestRevisionIdAllocation:
    def test_persist_after_delete_never_collides(self, tmp_path):
        from eventflux_engine_spark.streaming.persistence import RevisionStore

        ckpt = str(tmp_path / "ckpt")
        os.makedirs(ckpt)
        store = RevisionStore(str(tmp_path / "revs"), ckpt, {})
        r0 = store.persist()
        r1 = store.persist()
        r2 = store.persist()
        assert [r0, r1, r2] == ["rev-00000", "rev-00001", "rev-00002"]
        # delete the INTERMEDIATE revision: next id must be max+1, not count
        import shutil

        shutil.rmtree(os.path.join(store.root, r1))
        r3 = store.persist()
        assert r3 == "rev-00003"
        assert sorted(store.revisions()) == [r0, r2, r3]


class TestDmlReplayWarning:
    def test_non_commuting_statement_warns(self, spark):
        # a multiplicative self-referencing SET is outside the commuting
        # classes (neither additive nor a replacement) -> replay + warning
        app = EventFluxApp(spark).execute(
            """
            CREATE TABLE Inv (item VARCHAR, qty INT);
            CREATE STREAM Dbl (item VARCHAR);
            UPDATE Inv SET qty = Inv.qty * 2 FROM Dbl WHERE Inv.item = Dbl.item;
            """
        )
        app.send("Inv", [("a", 1), ("b", 2)])
        app.send("Dbl", [("a",), ("a",)])
        with pytest.warns(RuntimeWarning, match="commuting"):
            state = app._table_state("Inv")
        got = {r["item"]: r["qty"] for r in state}
        assert got == {"a": 4, "b": 2}

    def test_commuting_statement_does_not_warn(self, spark):
        app = EventFluxApp(spark).execute(
            """
            CREATE TABLE Inv (item VARCHAR, qty INT);
            CREATE STREAM Adj (item VARCHAR, d INT);
            UPDATE Inv SET qty = qty + d FROM Adj WHERE Inv.item = Adj.item;
            """
        )
        app.send("Inv", [("a", 1)])
        app.send("Adj", [("a", 4)])
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            state = app._table_state("Inv")
        assert state[0]["qty"] == 5
