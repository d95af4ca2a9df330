"""API-usage / limits accounting (sources/usage.py): header-dialect parser
parity with the reference (api.py:472-500 examples verbatim), round-trip
rendering, per-entity request counters wired through EntitySource, and the
opt-in quota enforcement."""

import pytest

from pgsf_spark.sources.entity import EntitySource
from pgsf_spark.sources.usage import (
    PerAppUsage,
    Usage,
    UsageLimitExceeded,
    UsageTracker,
    format_limit_info,
    parse_api_usage,
)

SF_DIR = "/root/testdata/sf0.001"


class TestHeaderDialect:
    def test_reference_example_1(self):
        # api.py:479 Example 1
        assert parse_api_usage("api-usage=18/5000") == {
            "api-usage": Usage(used=18, total=5000)
        }

    def test_reference_example_2(self):
        # api.py:480-482 Example 2
        got = parse_api_usage(
            "api-usage=25/5000; "
            "per-app-api-usage=17/250(appName=sample-connected-app)"
        )
        assert got["api-usage"] == Usage(used=25, total=5000)
        assert got["per-app-api-usage"] == PerAppUsage(
            used=17, total=250, name="sample-connected-app"
        )

    def test_unknown_clauses_ignored(self):
        got = parse_api_usage("api-usage=1/10; something-else=5; junk")
        assert got == {"api-usage": Usage(1, 10)}

    def test_malformed_fractions_ignored(self):
        # the reference's targeted regexes simply don't match these -- no
        # exception, surviving clauses still parse (ADVICE r9)
        got = parse_api_usage("api-usage=18/abc; per-app-api-usage=17/250(appName=a)")
        assert got == {"per-app-api-usage": PerAppUsage(17, 250, "a")}
        assert parse_api_usage("api-usage=18") == {}
        assert parse_api_usage("per-app-api-usage=x/y(appName=a); api-usage=1/2") == {
            "api-usage": Usage(1, 2)
        }

    def test_round_trip(self):
        header = format_limit_info(Usage(42, 100), PerAppUsage(7, 50, "etl"))
        got = parse_api_usage(header)
        assert got["api-usage"] == Usage(42, 100)
        assert got["per-app-api-usage"] == PerAppUsage(7, 50, "etl")


class TestTracker:
    def test_counts_per_entity_and_op(self):
        t = UsageTracker(quota=100)
        t.record("orders", "load")
        t.record("orders", "load", rows=10)
        t.record("customer", "count")
        lim = t.limits()
        assert lim["Requests"] == {"Max": 100, "Used": 3, "Remaining": 97}
        assert lim["ByEntity"]["orders"]["load"] == {"requests": 2, "rows": 10}
        assert lim["ByEntity"]["customer"]["count"]["requests"] == 1

    def test_api_usage_shape_updates_per_call(self):
        t = UsageTracker(quota=5)
        assert t.record("orders", "load") == Usage(1, 5)
        assert t.record("orders", "load") == Usage(2, 5)

    def test_enforce_raises_at_quota(self):
        t = UsageTracker(quota=2, enforce=True)
        t.record("a", "load")
        t.record("a", "load")
        with pytest.raises(UsageLimitExceeded, match="2/2"):
            t.record("a", "load")

    def test_report_only_never_blocks(self):
        t = UsageTracker(quota=1)
        t.record("a", "load")
        t.record("a", "load")  # over quota, reference-style report-only
        assert t.remaining() == 0 and t.used == 2

    def test_unmetered_header_raises(self):
        t = UsageTracker()  # quota=None: the dialect has no unmetered form
        t.record("a", "load")
        with pytest.raises(ValueError, match="unmetered"):
            t.header()
        assert t.api_usage == Usage(1, None)

    def test_header_round_trips_through_parser(self):
        t = UsageTracker(quota=50, app="pgsf-sync")
        t.record("orders", "load")
        got = parse_api_usage(t.header())
        assert got["api-usage"] == Usage(1, 50)
        assert got["per-app-api-usage"] == PerAppUsage(1, 50, "pgsf-sync")


class TestEntitySourceWiring:
    def test_each_scan_op_records_one_request(self, spark):
        t = UsageTracker(quota=1000)
        src = EntitySource(spark, SF_DIR, usage=t)
        src.load("orders", fields=["o_orderkey"], limit=5).collect()
        src.count("orders")
        src.updated_ids("events", "1990-01-01", "2100-01-01", pk="user_id", ts_field="ts").count()
        by = t.limits()["ByEntity"]
        assert by["orders"]["load"]["requests"] == 1
        assert by["orders"]["count"]["requests"] == 1
        assert by["events"]["updated_ids"]["requests"] == 1
        # count() delegates to the internal scan builder: exactly one
        # logical request per public op, never a load + count double-count
        assert t.used == 3

    def test_untracked_source_is_free(self, spark):
        src = EntitySource(spark, SF_DIR)
        assert src.count("region") > 0  # no tracker, no error
