"""bench.py load gating (VERDICT r9 ask #2).

BENCH_r09 recorded load_avg_1m_start=2.25 against an idle-box protocol and
nothing acted on the field. The gate must (a) pass an idle box straight
through, (b) wait-and-resample a busy box until it settles, and (c) give
up after LOAD_MAX_WAITS and tag the sample contaminated rather than hang
the driver.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_idle_box_passes_immediately(monkeypatch):
    monkeypatch.setattr(os, "getloadavg", lambda: (0.12, 0.3, 0.4))
    monkeypatch.setattr(bench.time, "sleep", lambda s: (_ for _ in ()).throw(AssertionError("slept")))
    load, gate = bench._gated_load_start()
    assert (load, gate) == (0.12, "idle")


def test_busy_box_waits_then_settles(monkeypatch, capsys):
    samples = iter([2.25, 1.1, 0.4])
    monkeypatch.setattr(os, "getloadavg", lambda: (next(samples), 0.0, 0.0))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    load, gate = bench._gated_load_start()
    assert (load, gate) == (0.4, "idle")
    assert slept == [bench.LOAD_WAIT_S] * 2
    err = capsys.readouterr().err
    assert "not idle" in err and "2.25" in err


def test_never_settles_tags_contaminated(monkeypatch, capsys):
    monkeypatch.setattr(os, "getloadavg", lambda: (3.0, 0.0, 0.0))
    slept = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    load, gate = bench._gated_load_start()
    assert (load, gate) == (3.0, "contaminated")
    assert len(slept) == bench.LOAD_MAX_WAITS
    assert "CONTAMINATED" in capsys.readouterr().err


def test_gate_threshold_is_the_verdict_value():
    # the ask names ~0.5; pin it so a silent loosening is loud
    assert bench.LOAD_GATE == 0.5


def test_official_artifact_is_median_of_three():
    # VERDICT r10 "What's wrong" #1: a single-sample artifact cannot
    # distinguish this host's +-25% noise band from a real regression --
    # the official bench now runs three COLD subprocess samples and reports
    # the median with per-sample spread
    assert bench.N_SAMPLES == 3
    assert bench._median([3.0, 1.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0]) == 2.5
    src = open(os.path.join(_REPO, "bench.py")).read()
    for key in ("samples_total", "samples_original10", "spread_pct", "n_samples"):
        assert f'"{key}"' in src, key
    # samples must be COLD (subprocess-per-sample): a same-session re-run
    # is ~2x faster (JIT/codegen caches: measured 13.1 s cold vs 6.5 s
    # warm) and would fake a speedup against every prior round's
    # single-cold-pass artifact
    assert "SPARK_GRAFT_BENCH_CHILD" in src
    assert '"sampling": "cold_subprocess_per_sample"' in src
    # contamination DURING any sample must be visible: per-sample end
    # loads ride the artifact next to the per-sample totals
    assert '"load_avg_1m_ends"' in src


def test_steal_telemetry_in_artifact():
    # between-run drift on this box is hypervisor state (measured ~10%
    # steal under full load; same-code medians 12.8 -> 20.5 s across one
    # afternoon with within-run spread <=11%) -- the artifact must carry
    # the per-sample steal fraction so that drift is attributable
    ticks = bench._cpu_steal_ticks()
    assert ticks is None or (len(ticks) == 2 and ticks[1] >= ticks[0] >= 0)
    src = open(os.path.join(_REPO, "bench.py")).read()
    assert '"steal_pcts"' in src
    assert '"steal_pct"' in src  # child payload field


def test_per_sample_gating_and_clean_median_selection():
    """VERDICT r12 ask #2: the load gate must run before EVERY sample and
    a weather-flagged sample (contaminated gate OR steal above
    STEAL_GATE) must be replaced (bounded) and excluded from the official
    median, while staying visible in the artifact for per-row
    adjudication."""
    assert bench.STEAL_GATE == 1.0
    assert bench.EXTRA_SAMPLES_MAX == 3
    # the clean predicate encodes the r11/r12 adjudication rule
    assert bench._sample_is_clean("idle", None)
    assert bench._sample_is_clean("idle", 0.2)
    assert bench._sample_is_clean("idle", 1.0)
    assert not bench._sample_is_clean("idle", 1.1)
    assert not bench._sample_is_clean("contaminated", 0.0)
    src = open(os.path.join(_REPO, "bench.py")).read()
    # the gate call sits INSIDE the sampling loop now
    for key in (
        '"load_avg_1m_starts"',
        '"steal_gate"',
        '"n_discarded"',
        '"discarded_totals"',
        '"discarded_steal_pcts"',
    ):
        assert key in src, key


def test_steal_total_excludes_guest_ticks(monkeypatch):
    """ADVICE r11 (low): guest/guest_nice ticks are already inside
    user/nice on Linux, so the denominator must sum user..steal only --
    summing all ten fields double-counts guest time and understates
    steal_pct on guest-running hosts."""
    import builtins
    import io

    real_open = builtins.open
    #        user nice sys idle iowait irq sirq steal guest gnice
    line = "cpu  100 2 300 4000 50 6 7 80 900 1000\n"

    def fake_open(path, *a, **k):
        if path == "/proc/stat":
            return io.StringIO(line)
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)
    steal, total = bench._cpu_steal_ticks()
    assert steal == 80
    assert total == 100 + 2 + 300 + 4000 + 50 + 6 + 7 + 80


def test_cooldown_retry_and_unmeasured_steal_fields():
    """VERDICT r13 ask #2 + ADVICE r13 #3: when the replacement budget
    runs out on a box that never settles, the protocol cools down and
    retries (bounded) instead of shipping a contaminated official number;
    and a sample whose steal telemetry was unavailable is recorded as
    unmeasured in the artifact rather than silently counted as gated."""
    assert bench.RETRY_ROUNDS_MAX >= 1
    assert bench.RETRY_COOLDOWN_S >= bench.LOAD_WAIT_S
    src = open(os.path.join(_REPO, "bench.py")).read()
    assert '"retry_rounds_used"' in src
    assert '"steal_unmeasured_samples"' in src
    # unavailable telemetry still counts clean (the driver needs a
    # number) -- but the artifact flags it, never passes it off as gated
    assert bench._sample_is_clean("idle", None)
    assert "UNVERIFIED" in src
