"""applyInPandasWithState: state must carry across micro-batches."""

import pytest

from pgsf_spark.streaming.stateful import running_user_stats


class TestRunningUserStats:
    def test_state_accumulates_across_batches(self, spark, tmp_path):
        feed = tmp_path / "feed"
        feed.mkdir()
        schema = "user_id long, value double"
        # two separate files -> maxFilesPerTrigger=1 forces two micro-batches
        spark.createDataFrame([(1, 10.0), (2, 5.0)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))
        spark.createDataFrame([(1, 2.5)], schema).coalesce(1).write.mode("append").parquet(str(feed))

        stream = (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )
        q = (
            running_user_stats(stream)
            .writeStream.format("memory")
            .queryName("user_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM user_stats").collect()
        # update mode appends one row per (user, batch) update; the LAST row
        # per user carries the accumulated state
        last = {}
        for r in rows:
            last[r["user_id"]] = (r["n_events"], r["total_value"])
        assert last[1] == (2, 12.5)  # state carried: 10.0 (+2.5) across batches
        assert last[2] == (1, 5.0)
        assert len(rows) >= 3  # user 1 emitted twice (two batches)

    def test_state_survives_query_restart(self, spark, tmp_path):
        # keyed state must restore from the checkpoint when a NEW query
        # starts over the same checkpoint dir (crash/redeploy recovery)
        feed = tmp_path / "feed2"
        feed.mkdir()
        ckpt = str(tmp_path / "ckpt2")
        schema = "user_id long, value double"

        out = str(tmp_path / "updates")

        def sink(df, _eid):
            df.write.mode("append").parquet(out)

        def run_once():
            # the memory sink can't recover from a checkpoint; foreachBatch can
            stream = spark.readStream.schema(spark.createDataFrame([], schema).schema).parquet(str(feed))
            q = (
                running_user_stats(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame([(7, 4.0)], schema).coalesce(1).write.mode("append").parquet(str(feed))
        run_once()
        spark.createDataFrame([(7, 6.0)], schema).coalesce(1).write.mode("append").parquet(str(feed))
        run_once()

        rows = spark.read.parquet(out).collect()
        last = max(rows, key=lambda r: r["n_events"])
        # 4.0 from the pre-restart query + 6.0 after: state restored
        assert (last["n_events"], last["total_value"]) == (2, 10.0)
