"""Model-based differential test for the CDC merge engine.

A pure-Python dict model implements the reference's sequential upsert
semantics (PG applies ON CONFLICT row-at-a-time in file order --
query_poll_table.py:107-152). Random-but-seeded batches of mixed
update/insert/delete ops are applied both ways; final states must match
exactly, including duplicate-PK and delete-then-reinsert interleavings.
"""

import random
from datetime import datetime, timedelta

from pgsf_spark.operators.merge import merge_upsert

T0 = datetime(2024, 1, 1)
SCHEMA = "Id string, v int, SystemModstamp timestamp, IsDeleted boolean, _file_order long"


def model_apply(state: dict, batch: list[tuple]) -> None:
    """Reference semantics: rows in file order; upsert non-deleted; then
    delete pass for IsDeleted keys (the reference runs the upsert INSERT
    first, then the DELETE -- query_poll_table.py:119-152)."""
    for (pk, v, ts, deleted, _order) in batch:
        if not deleted:
            state[pk] = v
    for (pk, v, ts, deleted, _order) in batch:
        if deleted:
            state.pop(pk, None)


def spark_apply(spark, df_state, batch):
    changes = spark.createDataFrame(batch, SCHEMA)
    return merge_upsert(df_state, changes, pk="Id", ts_field="SystemModstamp", order_col="_file_order")


class TestMergeVsModel:
    def test_random_batches_converge(self, spark):
        rng = random.Random(42)
        keys = [f"k{i}" for i in range(30)]
        snapshot = [(k, 0, T0, False, 0) for k in keys[:20]]

        model = {}
        model_apply(model, snapshot)
        df = spark.createDataFrame(snapshot, SCHEMA)

        for batch_no in range(1, 6):
            ts = T0 + timedelta(hours=batch_no)
            batch = []
            for order in range(rng.randint(5, 25)):
                pk = rng.choice(keys)
                op = rng.random()
                if op < 0.6:
                    batch.append((pk, rng.randint(1, 999), ts, False, order))
                else:
                    batch.append((pk, 0, ts, True, order))
            model_apply(model, batch)
            df = spark_apply(spark, df, batch)

        got = {r["Id"]: r["v"] for r in df.collect()}
        assert got == model

    def test_delete_wins_when_last_in_order(self, spark):
        df = spark.createDataFrame([("a", 1, T0, False, 0)], SCHEMA)
        ts = T0 + timedelta(hours=1)
        batch = [("a", 5, ts, False, 1), ("a", 0, ts, True, 2)]  # update then delete
        out = spark_apply(spark, df, batch).collect()
        assert out == []

    def test_delete_wins_even_when_first_in_order(self, spark):
        # reference: the delete pass runs AFTER the upsert pass, so any
        # IsDeleted row in the batch deletes the key regardless of order
        # (query_poll_table.py:139-152)
        df = spark.createDataFrame([("a", 1, T0, False, 0)], SCHEMA)
        ts = T0 + timedelta(hours=1)
        batch = [("a", 0, ts, True, 1), ("a", 7, ts, False, 2)]  # delete then update
        assert spark_apply(spark, df, batch).collect() == []

    def test_upsert_pass_last_occurrence_wins(self, spark):
        # within the non-deleted rows, last file-order occurrence wins
        df = spark.createDataFrame([("a", 1, T0, False, 0)], SCHEMA)
        ts = T0 + timedelta(hours=1)
        batch = [("a", 5, ts, False, 1), ("a", 9, ts, False, 2)]
        got = {r["Id"]: r["v"] for r in spark_apply(spark, df, batch).collect()}
        assert got == {"a": 9}
