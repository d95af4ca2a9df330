"""Randomized property check for the shared histogram-refinement
k-th-element core (_lower_median_refined): after the round-7 refactor it
backs BOTH exact_median_refinement and mad_robust_scale, so its lower-
median semantics are locked here against sorted-list truth on adversarial
shapes (duplicates, negatives, single element, huge spread)."""

import random

import pytest
from pyspark.sql import functions as F

from pgsf_spark.analytics.profiling import _lower_median_refined

CASES = []
_rng = random.Random(7)
CASES.append([5])
CASES.append([2, 2, 2, 2])
CASES.append([-10, 0, 10])
CASES.append([10**12, -(10**12), 0, 1])
for n in (2, 3, 7, 10, 25):
    CASES.append([_rng.randint(-1000, 1000) for _ in range(n)])
CASES.append([_rng.randint(0, 3) for _ in range(50)])  # heavy ties


class TestLowerMedianRefined:
    @pytest.mark.parametrize("vals", CASES, ids=[f"case{i}" for i in range(len(CASES))])
    def test_matches_sorted_truth(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], "v long").localCheckpoint()
        row = _lower_median_refined(df).collect()[0]
        truth = sorted(vals)[(len(vals) + 1) // 2 - 1]  # lower median
        assert row.v == truth and row.n == len(vals)
