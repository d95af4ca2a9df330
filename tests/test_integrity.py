"""Corrupted-parquet robustness gate (PERF.md round-14 plan item 2).

A landing zone with one truncated/garbage part file must surface as
"THIS file, THIS reason" -- at planning time, driver-side -- never as an
executor stack trace mid-scan, and never as silently-skipped rows
(spark.sql.files.ignoreCorruptFiles is the anti-pattern: whole files'
rows vanish without a ledger). sources/integrity.py detects (footer-only,
O(files)), names, and quarantines with a JSON ledger.
"""

import os

import pytest

from pgsf_spark.sources.integrity import (
    QUARANTINE_LEDGER,
    check_file,
    quarantine_corrupt,
    read_quarantine_ledger,
    scan_parquet_dir,
)


def _write_dir(spark, path, n=30):
    spark.range(n).selectExpr("id", "CAST(id AS STRING) AS s").repartition(
        3
    ).write.mode("overwrite").parquet(str(path))
    return sorted(
        os.path.join(str(path), f)
        for f in os.listdir(str(path))
        if f.endswith(".parquet")
    )


def _truncate(path, keep=30):
    with open(path, "r+b") as fh:
        data = fh.read(keep)
        fh.truncate(0)
        fh.seek(0)
        fh.write(data)


class TestDetection:
    def test_clean_dir_reports_clean(self, spark, tmp_path):
        files = _write_dir(spark, tmp_path / "t")
        report = scan_parquet_dir(str(tmp_path / "t"))
        assert report and list(report.good) == files and not report.bad
        assert "clean" in report.describe()

    def test_truncated_file_named_with_reason(self, spark, tmp_path):
        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[1])
        report = scan_parquet_dir(str(tmp_path / "t"))
        assert not report
        assert len(report.bad) == 1 and len(report.good) == len(files) - 1
        bad_file, reason = report.bad[0]
        assert bad_file == files[1]
        assert reason  # a parse failure, not a bare crash
        assert os.path.basename(files[1]) in report.describe()

    def test_zero_byte_and_garbage_files(self, spark, tmp_path):
        _write_dir(spark, tmp_path / "t")
        open(tmp_path / "t" / "zzz-empty.parquet", "w").close()
        with open(tmp_path / "t" / "zzz-garbage.parquet", "wb") as fh:
            fh.write(b"NOT A PARQUET FILE" * 100)
        report = scan_parquet_dir(str(tmp_path / "t"))
        reasons = {os.path.basename(f): r for f, r in report.bad}
        assert reasons["zzz-empty.parquet"] == "zero-byte file"
        assert "zzz-garbage.parquet" in reasons

    def test_check_file_is_footer_only_not_a_full_read(self, spark, tmp_path):
        # corrupt the MIDDLE of a large-ish file but keep the footer: the
        # footer-only check stays green (cheap by design -- data-page
        # validation is the scan's job), which is exactly the documented
        # detect-cheaply contract
        files = _write_dir(spark, tmp_path / "t", n=200_000)
        size = os.path.getsize(files[0])
        with open(files[0], "r+b") as fh:
            fh.seek(size // 2)
            fh.write(b"\x00" * 16)
        assert check_file(files[0]) is None


class TestQuarantine:
    def test_quarantine_moves_and_ledgers(self, spark, tmp_path):
        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[0])
        report = quarantine_corrupt(str(tmp_path / "t"))
        assert report  # clean after quarantine
        qfile = tmp_path / "t" / "_quarantine" / os.path.basename(files[0])
        assert qfile.exists() and not os.path.exists(files[0])
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        assert ledger[0]["file"] == os.path.basename(files[0])
        assert ledger[0]["reason"]
        # the load now succeeds on the good files (rows of the bad file
        # are EXPLICITLY absent, with the ledger saying which and why)
        assert spark.read.parquet(str(tmp_path / "t")).count() > 0

    def test_quarantine_is_idempotent_and_ledger_appends(self, spark, tmp_path):
        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[0])
        quarantine_corrupt(str(tmp_path / "t"))
        quarantine_corrupt(str(tmp_path / "t"))  # no-op
        _truncate(files[1])
        quarantine_corrupt(str(tmp_path / "t"))
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        assert [e["file"] for e in ledger] == [
            os.path.basename(files[0]),
            os.path.basename(files[1]),
        ]

    def test_single_file_entity_rejected(self, tmp_path):
        f = tmp_path / "x.parquet"
        f.write_bytes(b"junk")
        with pytest.raises(ValueError, match="directory"):
            quarantine_corrupt(str(f))


class TestEntitySourcePreflight:
    def test_integrity_check_names_file_at_scan_build(self, spark, tmp_path):
        from pgsf_spark.sources.entity import EntitySource

        base = tmp_path / "base"
        files = _write_dir(spark, base / "customer")
        _truncate(files[2])
        src = EntitySource(spark, str(base), integrity_check=True)
        with pytest.raises(ValueError, match=os.path.basename(files[2])):
            src.load("customer")
        # after quarantine the same source loads the good rows
        quarantine_corrupt(str(base / "customer"))
        assert src.load("customer").count() > 0

    def test_default_source_is_unchanged(self, spark, tmp_path):
        from pgsf_spark.sources.entity import EntitySource

        base = tmp_path / "base"
        _write_dir(spark, base / "customer")
        assert EntitySource(spark, str(base)).load("customer").count() == 30


class TestPythonDataSourceLoudCorruption:
    def test_entity_pages_planning_names_the_file(self, spark, tmp_path):
        from pgsf_spark.sources import pyds

        pyds.register(spark)
        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[1])
        key = "spark.sql.python.filterPushdown.enabled"
        old = spark.conf.get(key, None)
        spark.conf.set(key, "true")  # the source implements pushFilters
        try:
            # schema derivation reads files[0] (clean); planning walks all
            # files and must fail with files[1]'s NAME in the message
            with pytest.raises(Exception, match=os.path.basename(files[1])):
                (
                    spark.read.format("entity_pages")
                    .option("path", str(tmp_path / "t"))
                    .load()
                    .count()
                )
        finally:
            spark.conf.unset(key) if old is None else spark.conf.set(key, old)


class TestStoreIntegrity:
    def test_published_version_verifies_clean(self, spark, tmp_path):
        from pgsf_spark.operators.table_store import TableStore

        store = TableStore(spark, str(tmp_path / "store"))
        store.write(spark.range(100).selectExpr("id", "id * 2 AS v"), "t")
        report = store.verify_integrity("t")
        assert report and report.good and not report.bad

    def test_out_of_band_corruption_detected_with_name(self, spark, tmp_path):
        from pgsf_spark.operators.table_store import TableStore

        store = TableStore(spark, str(tmp_path / "store"))
        store.write(
            spark.range(100).selectExpr(
                "id", "CAST(id % 4 AS INT) AS b"
            ),
            "t",
            partition_by=["b"],
        )
        root = store.current_version_path("t")
        victims = [
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        ]
        _truncate(sorted(victims)[0])
        report = store.verify_integrity("t")
        assert not report
        assert report.bad[0][0] == sorted(victims)[0]


class TestNestedLandingZone:
    def test_partitioned_zone_is_scanned_recursively(self, spark, tmp_path):
        """A hive-partitioned landing zone keeps part files in
        subdirectories; a top-level-only scan would report 'clean
        (0 files)' -- the exact blindness the gate exists to prevent."""
        zone = tmp_path / "zone"
        spark.range(40).selectExpr(
            "id", "CAST(id % 2 AS INT) AS p"
        ).write.partitionBy("p").parquet(str(zone))
        report = scan_parquet_dir(str(zone))
        assert len(report.good) >= 2 and not report.bad
        victim = report.good[0]
        _truncate(victim)
        report2 = scan_parquet_dir(str(zone))
        assert report2.bad and report2.bad[0][0] == victim
        clean = quarantine_corrupt(str(zone), report2)
        assert clean
        ledger = read_quarantine_ledger(str(zone))
        # evidence name flattens the partition path; source keeps it
        assert ledger[0]["source"].startswith("p=")
        assert "__" in ledger[0]["file"]
        assert spark.read.parquet(str(zone)).count() > 0

    def test_relanded_corrupt_file_never_replaces_evidence(self, spark, tmp_path):
        """A re-landed corrupt file with the SAME name: the second
        quarantine must keep BOTH evidence files (suffix, not replace)
        and ledger both incidents."""
        files = _write_dir(spark, tmp_path / "t")
        name = os.path.basename(files[0])
        _truncate(files[0])
        quarantine_corrupt(str(tmp_path / "t"))
        # upstream re-lands the same file name, corrupt again
        with open(files[0], "wb") as fh:
            fh.write(b"garbage bytes")
        quarantine_corrupt(str(tmp_path / "t"))
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        assert len(ledger) == 2
        stored = [e["file"] for e in ledger]
        assert len(set(stored)) == 2  # distinct evidence names
        for s in stored:
            assert os.path.exists(tmp_path / "t" / "_quarantine" / s)
        assert all(e["source"] == name for e in ledger)


class TestDistributedScan:
    def test_distributed_matches_driver_side_scan(self, spark, tmp_path):
        """Same IntegrityReport from both scanners on a nested zone with
        mixed corruption -- the distributed path is the same pure
        check_file, just fanned out."""
        from pgsf_spark.sources.integrity import scan_parquet_dir_distributed

        zone = tmp_path / "zone"
        spark.range(60).selectExpr(
            "id", "CAST(id % 3 AS INT) AS p"
        ).write.partitionBy("p").parquet(str(zone))
        local = scan_parquet_dir(str(zone))
        assert len(local.good) >= 3
        _truncate(local.good[0])
        open(zone / "zzz-empty.parquet", "w").close()
        local = scan_parquet_dir(str(zone))
        dist = scan_parquet_dir_distributed(spark, str(zone))
        assert dist.good == local.good
        assert dist.bad == local.bad
        assert len(dist.bad) == 2

    def test_distributed_empty_zone(self, spark, tmp_path):
        from pgsf_spark.sources.integrity import scan_parquet_dir_distributed

        zone = tmp_path / "zone"
        zone.mkdir()
        report = scan_parquet_dir_distributed(spark, str(zone))
        assert report and not report.good and not report.bad

    def test_distributed_feeds_quarantine(self, spark, tmp_path):
        from pgsf_spark.sources.integrity import scan_parquet_dir_distributed

        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[1])
        report = scan_parquet_dir_distributed(spark, str(tmp_path / "t"))
        clean = quarantine_corrupt(str(tmp_path / "t"), report)
        assert clean
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        assert ledger[0]["source"] == os.path.basename(files[1])


class TestEnvErrorClassing:
    """ADVICE r11 (medium): an I/O/access failure says the file could not
    be REACHED, not that its bytes are bad -- on a cluster where executors
    cannot see a driver-local path every healthy file fails that way, and
    a quarantine acting on the signal would move the whole zone aside."""

    def test_missing_file_is_env_not_corruption(self, tmp_path):
        from pgsf_spark.sources.integrity import is_env_reason

        reason = check_file(str(tmp_path / "nope.parquet"))
        assert reason is not None
        assert is_env_reason(reason)
        assert "FileNotFoundError" in reason

    def test_corruption_reasons_stay_corruption(self, spark, tmp_path):
        from pgsf_spark.sources.integrity import is_env_reason

        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[0])
        open(tmp_path / "t" / "zzz-garbage.parquet", "wb").write(b"junk" * 64)
        open(tmp_path / "t" / "zzz-zero.parquet", "w").close()
        report = scan_parquet_dir(str(tmp_path / "t"))
        assert len(report.bad) == 3
        for f, reason in report.bad:
            assert not is_env_reason(reason), (f, reason)

    def test_quarantine_refuses_env_failures_and_moves_nothing(
        self, spark, tmp_path
    ):
        from pgsf_spark.sources.integrity import ENV_REASON_PREFIX, IntegrityReport

        files = _write_dir(spark, tmp_path / "t")
        # the unreachable-zone shape: every file "bad" with an env reason
        rep = IntegrityReport(
            good=(),
            bad=tuple(
                (f, f"{ENV_REASON_PREFIX}PermissionError: denied") for f in files
            ),
        )
        with pytest.raises(RuntimeError, match="ENVIRONMENT"):
            quarantine_corrupt(str(tmp_path / "t"), rep)
        for f in files:
            assert os.path.exists(f), f  # nothing moved
        assert not os.path.exists(tmp_path / "t" / QUARANTINE_LEDGER)

    def test_mixed_env_and_corruption_refused_before_any_move(
        self, spark, tmp_path
    ):
        # refusal must come BEFORE acting on the genuinely-corrupt entry:
        # half-acting then raising would leave an ambiguous zone
        from pgsf_spark.sources.integrity import ENV_REASON_PREFIX, IntegrityReport

        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[0])
        rep = IntegrityReport(
            good=tuple(files[2:]),
            bad=(
                (files[0], "ArrowInvalid: truncated"),
                (files[1], f"{ENV_REASON_PREFIX}OSError: I/O error"),
            ),
        )
        with pytest.raises(RuntimeError, match="ENVIRONMENT"):
            quarantine_corrupt(str(tmp_path / "t"), rep)
        assert os.path.exists(files[0])  # corrupt file NOT moved either


class TestLedgerBeforeMove:
    """ADVICE r11 (low): the ledger entry is flushed BEFORE each move, so
    a crash mid-loop can never leave evidence files in _quarantine/
    without the audit record the function exists to guarantee."""

    def test_crash_mid_loop_leaves_every_evidence_file_ledgered(
        self, spark, tmp_path, monkeypatch
    ):
        import shutil

        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[0])
        _truncate(files[1])
        moved = []
        orig_move = shutil.move

        def crashy_move(src, dst):
            if moved:  # second move crashes
                raise OSError("disk gone")
            moved.append(src)
            return orig_move(src, dst)

        monkeypatch.setattr(shutil, "move", crashy_move)
        with pytest.raises(OSError, match="disk gone"):
            quarantine_corrupt(str(tmp_path / "t"))
        monkeypatch.undo()

        qdir = tmp_path / "t" / "_quarantine"
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        evidence = [n for n in os.listdir(qdir) if n.endswith(".parquet")]
        ledgered = {e["file"] for e in ledger}
        assert evidence and set(evidence) <= ledgered  # never unledgered
        # the reverse window (ledgered, move pending) self-heals on re-run
        clean = quarantine_corrupt(str(tmp_path / "t"))
        assert clean
        ledger2 = read_quarantine_ledger(str(tmp_path / "t"))
        evidence2 = {
            n for n in os.listdir(qdir) if n.endswith(".parquet")
        }
        assert evidence2 <= {e["file"] for e in ledger2}
        assert len(evidence2) == 2  # both corrupt files quarantined


class TestVerifyIntegritySkipPolicy:
    """ADVICE r11 (medium): verify_integrity shares _list_part_files with
    the zone scanners, so metadata conventions (underscore/dot names --
    the ones Spark's readers skip) never mark a version bad."""

    def test_metadata_conventions_never_mark_version_bad(self, spark, tmp_path):
        from pgsf_spark.operators.table_store import TableStore

        store = TableStore(spark, str(tmp_path / "store"))
        store.write(spark.range(50).selectExpr("id", "id * 2 AS v"), "t")
        root = store.current_version_path("t")
        # junk no reader ever touches: a quarantine dir, a temp leftover,
        # and a hidden sidecar -- all containing garbage "parquet"
        os.makedirs(os.path.join(root, "_quarantine"))
        open(os.path.join(root, "_quarantine", "bad.parquet"), "wb").write(b"junk")
        open(os.path.join(root, "_tmp-leftover.parquet"), "wb").write(b"junk")
        open(os.path.join(root, ".hidden.parquet"), "wb").write(b"junk")
        report = store.verify_integrity("t")
        assert report and report.good and not report.bad
        # a REAL part file going bad is still caught
        _truncate(report.good[0])
        assert not store.verify_integrity("t")


class TestDistributedScanAtFileCount:
    """VERDICT r11 ask #5: the million-file form exercised at a realistic
    file count -- listing stays O(names) driver-side, the executor
    fan-out partitions evenly, and quarantine accepts the report."""

    N_FILES = 2048

    def _zone_of_many(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        zone = tmp_path / "zone"
        zone.mkdir()
        seed = zone / "part-00000.parquet"
        pq.write_table(pa.table({"id": pa.array([1, 2, 3], pa.int64())}), seed)
        data = open(seed, "rb").read()
        for i in range(1, self.N_FILES):
            open(zone / f"part-{i:05d}.parquet", "wb").write(data)
        return zone

    def test_fanout_is_even_and_bounded(self):
        from pgsf_spark.sources.integrity import _fanout_slices

        # never more slices than files; 2 slices/core otherwise
        assert _fanout_slices(3, 32) == 3
        assert _fanout_slices(self.N_FILES, 32) == 64
        assert _fanout_slices(0, 32) == 1
        # round-robin repartition puts ceil/floor(n/slices) paths per
        # slice: with 2048 files over 64 slices, exactly 32 each
        assert self.N_FILES % _fanout_slices(self.N_FILES, 32) == 0

    def test_two_thousand_file_zone_scan_and_quarantine(self, spark, tmp_path):
        from pgsf_spark.sources.integrity import (
            _fanout_slices,
            _list_part_files,
            scan_parquet_dir_distributed,
        )

        zone = self._zone_of_many(tmp_path)
        files = _list_part_files(str(zone))
        assert len(files) == self.N_FILES
        # corrupt three files scattered across the listing
        for victim in (files[0], files[777], files[-1]):
            _truncate(victim)
        report = scan_parquet_dir_distributed(spark, str(zone))
        assert len(report.bad) == 3
        assert len(report.good) == self.N_FILES - 3
        assert {f for f, _ in report.bad} == {files[0], files[777], files[-1]}
        # the fan-out the scan used: 2 slices/core, capped by file count
        expected = min(
            self.N_FILES, spark.sparkContext.defaultParallelism * 2
        )
        assert _fanout_slices(
            self.N_FILES, spark.sparkContext.defaultParallelism
        ) == expected
        clean = quarantine_corrupt(str(zone), report)
        assert clean and len(clean.good) == self.N_FILES - 3
        ledger = read_quarantine_ledger(str(zone))
        assert len(ledger) == 3


class TestThriftCorruptionClassing:
    """Self-review r12: pyarrow surfaces a corrupt-thrift footer as a
    BARE builtins OSError with errno None (its ArrowIOError is an alias
    of OSError, not a pyarrow-module subclass) -- that shape is
    CORRUPTION and must stay quarantinable; only errno-carrying OS
    failures are environmental."""

    @staticmethod
    def _thrift_corrupt(path):
        data = bytearray(open(path, "rb").read())
        n = len(data)
        # garble thrift bytes in the footer, keep the trailing 8 bytes
        # (footer length + PAR1 magic) intact
        for i in range(max(0, n - 60), n - 8):
            data[i] ^= 0xFF
        open(path, "wb").write(bytes(data))

    def test_thrift_corruption_is_corruption_not_env(self, spark, tmp_path):
        from pgsf_spark.sources.integrity import is_env_reason

        files = _write_dir(spark, tmp_path / "t")
        self._thrift_corrupt(files[0])
        reason = check_file(files[0])
        assert reason is not None
        assert not is_env_reason(reason), reason

    def test_thrift_corrupt_file_is_quarantinable(self, spark, tmp_path):
        files = _write_dir(spark, tmp_path / "t")
        self._thrift_corrupt(files[1])
        clean = quarantine_corrupt(str(tmp_path / "t"))
        assert clean
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        assert len(ledger) == 1
        assert ledger[0]["source"] == os.path.basename(files[1])


class TestLedgerJsonl:
    def test_legacy_array_ledger_converts_and_appends(self, spark, tmp_path):
        """A pre-JSONL zone (array-format ledger) keeps its history: the
        first post-migration quarantine converts it once, then appends."""
        import json

        files = _write_dir(spark, tmp_path / "t")
        qdir = tmp_path / "t" / "_quarantine"
        os.makedirs(qdir)
        legacy = [{"file": "old.parquet", "source": "old.parquet", "reason": "x"}]
        with open(tmp_path / "t" / QUARANTINE_LEDGER, "w") as fh:
            json.dump(legacy, fh)
        _truncate(files[0])
        clean = quarantine_corrupt(str(tmp_path / "t"))
        assert clean
        ledger = read_quarantine_ledger(str(tmp_path / "t"))
        assert ledger[0] == legacy[0]  # history preserved, oldest first
        assert ledger[1]["source"] == os.path.basename(files[0])
        # and the file is now JSONL (starts with an object, not an array)
        assert open(tmp_path / "t" / QUARANTINE_LEDGER).read(1) == "{"

    def test_torn_trailing_line_is_skipped(self, spark, tmp_path):
        files = _write_dir(spark, tmp_path / "t")
        _truncate(files[0])
        quarantine_corrupt(str(tmp_path / "t"))
        ledger_path = tmp_path / "t" / QUARANTINE_LEDGER
        whole = read_quarantine_ledger(str(tmp_path / "t"))
        with open(ledger_path, "a") as fh:
            fh.write('{"file": "torn-no-newline-and-unbal')  # crash artifact
        assert read_quarantine_ledger(str(tmp_path / "t")) == whole
