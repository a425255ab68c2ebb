"""TPU-tunnel outage probe (utils/outage.py): the one shared helper behind
bench.py's CPU fallback and dryrun_multichip's subprocess dispatch."""

import subprocess
import types

from nwhead_tpu.utils import outage


def test_parses_healthy_output(monkeypatch):
    def fake_run(*a, **k):
        return types.SimpleNamespace(returncode=0, stdout="warning noise\ntpu 8\n")
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert outage.probe_backend() == ("tpu", 8)


def test_hang_returns_none(monkeypatch):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=k.get("timeout"))
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert outage.probe_backend(timeout_s=1.0) is None


def test_garbage_and_failure_return_none(monkeypatch):
    for rc, out in ((1, "tpu 8\n"), (0, ""), (0, "not parseable\n")):
        monkeypatch.setattr(
            subprocess, "run",
            lambda *a, rc=rc, out=out, **k: types.SimpleNamespace(
                returncode=rc, stdout=out),
        )
        assert outage.probe_backend() is None


def test_real_subprocess_timeout_path():
    """Against a possibly-hung tunnel a 1 s budget must come back None
    quickly (the subprocess cannot finish backend init that fast here);
    the helper must never block the caller past its timeout."""
    import time

    t0 = time.time()
    r = outage.probe_backend(timeout_s=1.0)
    assert time.time() - t0 < 30
    assert r is None or r[0] in ("tpu", "cpu")
