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


class _ScriptedProbe:
    """Probe stub: returns the scripted values in order; repeats the last
    one if the warmup asks for more probes than scripted."""

    def __init__(self, values):
        self.values = list(values)
        self.n_probes = 0

    def __call__(self):
        v = self.values[min(self.n_probes, len(self.values) - 1)]
        self.n_probes += 1
        return v


def _run(values):
    probe = _ScriptedProbe(values)
    warms = []
    out = _bench._plateau_warmup(probe, warms.append)
    return out, probe.n_probes, warms


def test_plateau_already_warm_runs_no_slice():
    # Flat probes: plateau confirmed after two non-improving probes,
    # zero warm slices (probe-then-warm ordering, r12 ADVICE low).
    out, n_probes, warms = _run([1.0, 1.0, 1.0])
    assert warms == []
    assert n_probes == 3
    assert out == 1.0


def test_plateau_improving_then_converged():
    # 1.0 -> 0.5 improving (warm slice 0) -> 0.48, 0.47 both within 5%
    # of their predecessor -> plateau; one slice total.
    out, n_probes, warms = _run([1.0, 0.5, 0.48, 0.47])
    assert warms == [0]
    assert out == 0.47


def test_single_noisy_probe_does_not_end_warmup():
    # r12 verdict #4: one noise-SLOW probe (1.05 after 1.0) used to
    # declare the plateau immediately. Now it only counts as ONE
    # non-improving probe; the next probe still improving (0.5) resets
    # the count and warming continues.
    out, n_probes, warms = _run([1.0, 1.05, 0.5, 0.49, 0.485])
    assert warms == [0]       # warming DID continue past the noisy probe
    assert out == 0.485


def test_plateau_slice_cap_bounds_warmup():
    # Monotonically improving forever: exactly max_slices slices run,
    # then the loop exits with the last probe.
    vals = [1.0, 0.8, 0.6, 0.4, 0.2, 0.1]
    out, n_probes, warms = _run(vals)
    assert warms == [0, 1, 2]  # the 3-slice cap
    assert out == 0.2          # probe after the 3rd slice, cap hit


def test_bench_detail_build_exec_fields():
    # r12 verdict #3: the per-query detail entry carries the build/exec
    # split a contended-sweep adjudication needs.
    builds, execs = [0.1, 0.2, 0.3], [1.0, 1.1, 1.2]
    runs = [b + e for b, e in zip(builds, execs)]
    entry = _bench._detail_entry(runs, builds, execs)
    assert entry["build_median"] == 0.2
    assert entry["exec_median"] == 1.1
    assert entry["median"] == 1.3
    assert entry["best"] == 1.1
    assert entry["runs"] == [1.1, 1.3, 1.5]


def test_host_sample_shape():
    # On Linux (the only runtime this repo targets) the real sampler
    # returns loadavg plus the 8-way tick split.
    s = _bench._host_sample()
    assert set(s) >= {"load1", "load5", "cpu_ticks"}
    assert set(s["cpu_ticks"]) == {
        "user", "nice", "system", "idle",
        "iowait", "irq", "softirq", "steal",
    }


def test_detail_paths_adopt_gate(tmp_path):
    """r15 (verdict r14 what's-wrong #1): a sweep always writes its
    run-stamped detail (gitignored); the committed BENCH_DETAIL.json is
    touched ONLY under --adopt, so a driver sweep can no longer clobber
    the adjudicated artifact-of-record as a side effect."""
    from bench import _detail_paths

    plain = _detail_paths(tmp_path, adopt=False, run_id="20260816-010203")
    assert [p.name for p in plain] == ["BENCH_DETAIL.20260816-010203.json"]
    adopted = _detail_paths(tmp_path, adopt=True, run_id="20260816-010203")
    assert [p.name for p in adopted] == [
        "BENCH_DETAIL.20260816-010203.json",
        "BENCH_DETAIL.json",
    ]
