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
