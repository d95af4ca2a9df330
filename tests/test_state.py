"""Sync-state machine tests (C1/C4: __sync semantics, install.sql:4-16,
synctable.py:32-106, onreboot, abort_refresh)."""

from datetime import datetime, timedelta, timezone

import pytest

from pgsf_spark.sync.state import ERROR, READY, RUNNING, ClaimError, SyncState

WM = datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture()
def state(tmp_path):
    return SyncState(str(tmp_path / "sync.json"))


class TestClaim:
    def test_insert_and_claim(self, state):
        state.insert("customer", WM)
        row = state.claim("customer")
        assert row.syncuntil_dt() == WM
        assert state.get("customer").status == RUNNING

    def test_double_claim_blocked(self, state):
        # the guarded UPDATE ... WHERE status='ready' (synctable.py:63-73)
        state.insert("customer", WM)
        state.claim("customer")
        with pytest.raises(ClaimError):
            state.claim("customer")

    def test_claim_without_row_demands_bulk_load(self, state):
        # query_poll_table.py:69-73: "use bulk the first time"
        with pytest.raises(ClaimError):
            state.claim("nonexistent")

    def test_release_advances_watermark(self, state):
        state.insert("customer", WM)
        state.claim("customer")
        new_wm = WM + timedelta(hours=1)
        state.release("customer", READY, syncuntil=new_wm)
        r = state.get("customer")
        assert r.status == READY and r.syncuntil_dt() == new_wm

    def test_error_pauses_table(self, state):
        state.insert("customer", WM)
        state.abort("customer")
        assert state.get("customer").status == ERROR
        with pytest.raises(ClaimError):
            state.claim("customer")


class TestScheduler:
    def test_due_tables_by_cadence(self, state):
        # sync:13 selection: ready AND last_refresh + refresh_minutes < now
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        state.insert("fresh", WM, refresh_minutes=10)
        state.claim("fresh")
        state.release("fresh", READY)  # last_refresh = now -> not due
        state.insert("stale", WM, refresh_minutes=10)
        state.claim("stale")
        state.release("stale", READY)
        # manufacture staleness
        rows = state._load()
        rows["stale"]["last_refresh"] = (now - timedelta(minutes=30)).strftime("%Y-%m-%dT%H:%M:%SZ")
        state._save(rows)
        due = state.due_tables()
        assert "stale" in due and "fresh" not in due

    def test_never_refreshed_is_due(self, state):
        state.insert("customer", WM)
        assert "customer" in state.due_tables()

    def test_running_and_error_not_due(self, state):
        state.insert("a", WM)
        state.claim("a")
        state.insert("b", WM)
        state.abort("b")
        due = state.due_tables()
        assert "a" not in due and "b" not in due


class TestRecovery:
    def test_recover_stuck_running(self, state):
        # onreboot:13-24
        state.insert("customer", WM)
        state.claim("customer")
        fixed = state.recover_stuck()
        assert fixed == ["customer"]
        assert state.get("customer").status == READY

    def test_concurrent_claims_single_winner(self, state):
        import threading

        state.insert("customer", WM)
        wins, losses = [], []

        def worker():
            try:
                state.claim("customer")
                wins.append(1)
            except ClaimError:
                losses.append(1)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1 and len(losses) == 7
