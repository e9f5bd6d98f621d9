"""Unit tests for bench.py's host-telemetry helpers (pure functions).

The sweep adjudication trail (COVERAGE "Bench canary fixed + host
telemetry") depends on busy_frac/steal_frac being computed correctly from
/proc/stat tick deltas; these tests pin the arithmetic and the
degraded-input behavior without starting Spark.
"""

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench_mod", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def _ticks(**kw):
    base = {
        "user": 0, "nice": 0, "system": 0, "idle": 0,
        "iowait": 0, "irq": 0, "softirq": 0, "steal": 0,
    }
    base.update(kw)
    return base


def test_host_delta_fractions():
    start = {"load1": 0.1, "load5": 0.2, "cpu_ticks": _ticks()}
    # 1000 ticks elapsed: 600 user, 100 system, 200 idle, 50 iowait,
    # 50 steal -> busy = 1 - (200+50)/1000 = 0.75, steal = 0.05
    end = {
        "load1": 1.0,
        "load5": 0.5,
        "cpu_ticks": _ticks(
            user=600, system=100, idle=200, iowait=50, steal=50
        ),
    }
    host = _bench._host_delta(start, end)
    assert host["busy_frac"] == 0.75
    assert host["steal_frac"] == 0.05
    assert host["start"] is start and host["end"] is end


def test_host_delta_zero_elapsed_and_missing_keys():
    # Zero elapsed ticks: fractions undefined -> omitted, no division error.
    s = {"cpu_ticks": _ticks()}
    host = _bench._host_delta(s, {"cpu_ticks": _ticks()})
    assert "busy_frac" not in host and "steal_frac" not in host
    # A degraded sample (unreadable /proc -> no cpu_ticks) still returns
    # the raw samples for the record instead of raising.
    host = _bench._host_delta({}, {"cpu_ticks": _ticks(user=10)})
    assert host == {"start": {}, "end": {"cpu_ticks": _ticks(user=10)}}


def test_host_sample_shape():
    # On Linux (the only runtime this repo targets) the real sampler
    # returns loadavg plus the 8-way tick split.
    s = _bench._host_sample()
    assert set(s) >= {"load1", "load5", "cpu_ticks"}
    assert set(s["cpu_ticks"]) == {
        "user", "nice", "system", "idle",
        "iowait", "irq", "softirq", "steal",
    }
