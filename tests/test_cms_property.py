"""Randomized guarantee check for the Count-Min sketch the heavy-hitter
pass relies on: the broadcast-literal estimate must NEVER underestimate a
token's exact count (that no-false-negative property is what makes the
two-pass exact heavy hitters correct), and collisions only inflate."""

import random

from pyspark.sql import functions as F

from pgsf_spark.analytics.text import CMS_D, CMS_W, _cms_cells


class TestCmsNoFalseNegative:
    def test_estimates_dominate_exact_counts(self, spark):
        rng = random.Random(11)
        vocab = [f"tok{i}" for i in range(300)]  # > CMS_W: collisions certain
        stream = [rng.choice(vocab) for _ in range(5000)]
        tok = spark.createDataFrame([(t,) for t in stream], "token string")
        sketch = (
            tok.select(F.explode(_cms_cells(F.col("token"))).alias("c"))
            .select("c.row", "c.col")
            .groupBy("row", "col")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        cells = {(r.row, r.col): r.cnt for r in sketch.collect()}
        assert sum(v for (r, _c), v in cells.items() if r == 0) == len(stream)
        arr = F.array(
            *[F.lit(cells.get((i, c), 0)) for i in range(CMS_D) for c in range(CMS_W)]
        )
        ests = []
        for i in range(CMS_D):
            h = F.conv(
                F.substring(F.md5(F.concat(F.lit(f"cms{i}:"), F.col("token"))), 1, 8),
                16,
                10,
            ).cast("long")
            ests.append(F.element_at(arr, ((h % CMS_W) + i * CMS_W + 1).cast("int")))
        got = (
            tok.groupBy("token")
            .agg(F.count(F.lit(1)).alias("exact"))
            .withColumn("est", F.least(*ests))
            .collect()
        )
        assert len(got) > 0
        over = 0
        for r in got:
            assert r.est >= r.exact, f"{r.token}: est {r.est} < exact {r.exact}"
            over += int(r.est > r.exact)
        # with 300 tokens in 256 columns, at least some rows must collide
        assert over > 0
