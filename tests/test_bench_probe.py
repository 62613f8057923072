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
