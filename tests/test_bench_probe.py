"""bench.py's tunnel probe must CLASSIFY failures: a hang or connection
error is a tunnel outage (tpu_tunnel_down), any other nonzero exit is a
broken environment (tpu_probe_failed) — conflating them would let a
broken bench masquerade as an outage in the driver record (round-4
review finding)."""
import subprocess
import sys
from types import SimpleNamespace

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench


def _fake_run(returncode, stdout="", stderr="", timeout=False):
    def run(*a, **kw):
        if timeout:
            raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])
        return SimpleNamespace(returncode=returncode, stdout=stdout,
                               stderr=stderr)
    return run


class TestProbeTunnel:
    def test_up(self, monkeypatch):
        monkeypatch.setattr(subprocess, "run", _fake_run(0, stdout="1\n"))
        status, detail = bench.probe_tunnel(timeout_s=1)
        assert status == "up" and detail == "1"

    def test_hang_is_down(self, monkeypatch):
        monkeypatch.setattr(subprocess, "run", _fake_run(0, timeout=True))
        status, _ = bench.probe_tunnel(timeout_s=1)
        assert status == "down"

    def test_connection_refused_is_down(self, monkeypatch):
        monkeypatch.setattr(subprocess, "run", _fake_run(
            1, stderr="RuntimeError: Unable to initialize backend 'axon': "
                      "... Connection refused"))
        status, detail = bench.probe_tunnel(timeout_s=1)
        assert status == "down" and "Connection refused" in detail

    def test_other_failure_is_broken(self, monkeypatch):
        monkeypatch.setattr(subprocess, "run", _fake_run(
            1, stderr="ModuleNotFoundError: No module named 'jax'"))
        status, detail = bench.probe_tunnel(timeout_s=1)
        assert status == "broken" and "ModuleNotFoundError" in detail

    def test_garbage_stdout_is_broken(self, monkeypatch):
        monkeypatch.setattr(subprocess, "run", _fake_run(
            0, stdout="something unexpected"))
        status, _ = bench.probe_tunnel(timeout_s=1)
        assert status == "broken"


class TestTimingHelpers:
    """afan.utils.timing: the RTT probe must fetch FRESH arrays (jax
    caches host values per Array — re-fetching a pulled buffer reads ~0,
    the round-5 code-review catch), and the window helper must subtract
    the RTT once per window, not per iteration."""

    def test_measure_rtt_positive_and_small_on_cpu(self):
        from afan.utils.timing import measure_rtt
        rtt = measure_rtt(probes=3)
        assert 0.0 < rtt < 1.0  # CPU backend: microseconds-to-ms scale

    def test_rtt_subtracted_once_per_window(self):
        from afan.utils.timing import time_chained_windows
        calls = {"n": 0, "f": 0}

        def run_one():
            calls["n"] += 1

        def fetch():
            calls["f"] += 1

        mn, med = time_chained_windows(run_one, fetch, iters=4, windows=3,
                                       rtt=0.0)
        assert calls == {"n": 12, "f": 3}
        assert 0.0 <= mn <= med
        # a large fake RTT drives the per-iter time negative, proving the
        # subtraction is window-level (elapsed - rtt) / iters
        mn2, _ = time_chained_windows(run_one, fetch, iters=4, windows=1,
                                      rtt=10.0)
        assert mn2 < 0
