"""bench.py must degrade gracefully when the TPU backend is unreachable
(VERDICT r3 weak #1 / directive #1): the driver runs it unattended at end
of round, and an axon-relay outage must yield the ONE parseable JSON line
with an error field and rc=0 — never a raw traceback with rc=1
(BENCH_r03.json failure mode)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_overrides, timeout=120):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)


def test_bench_emits_error_json_when_backend_unavailable():
    # JAX_PLATFORMS=axon with the axon plugin unregistered (no pool IPs)
    # makes jax.devices() raise "unknown backend" in the probe subprocess
    # — the same terminal condition as a dead relay, without the hang.
    env = {
        "JAX_PLATFORMS": "axon",
        "PALLAS_AXON_POOL_IPS": "",
        "PPN_BENCH_PROBE_BUDGET_S": "4",
    }
    r = _run_bench(env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "inference_images_per_sec_chip"
    assert rec["unit"] == "images/sec"
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert rec["error"] == "tpu_unavailable"


def test_wait_for_backend_respects_budget(monkeypatch):
    # The polling loop must give up after PPN_BENCH_PROBE_BUDGET_S even if
    # every probe hangs-then-fails, so the driver's artifact capture is
    # never open-ended.
    import time

    sys.path.insert(0, REPO)
    try:
        import bench
        monkeypatch.setenv("PPN_BENCH_PROBE_BUDGET_S", "2")
        monkeypatch.setattr(bench, "_probe_backend", lambda timeout_s: False)
        t0 = time.perf_counter()
        assert bench._wait_for_backend() is False
        assert time.perf_counter() - t0 < 30
    finally:
        sys.path.remove(REPO)


class _FakeCompleted:
    def __init__(self, stdout, rc=0, stderr=""):
        self.stdout = stdout
        self.stderr = stderr
        self.returncode = rc


def test_bench_hang_watchdog_emits_error_json(monkeypatch, capsys):
    # 2026-08-20 failure mode: backend probe succeeds, then the warmup
    # dispatch hangs forever (RPC died silently). The measurement runs in a
    # bounded subprocess; two timeouts must still yield ONE JSON line.
    sys.path.insert(0, REPO)
    try:
        import bench
        calls = []

        def fake_run(*a, **kw):
            calls.append(1)
            raise subprocess.TimeoutExpired(cmd="bench", timeout=kw["timeout"])

        monkeypatch.setattr(bench, "_wait_for_backend", lambda *a: True)
        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
        assert len(calls) == 2  # one retry
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["value"] == 0.0
        assert "tpu_hang" in rec["error"]
    finally:
        sys.path.remove(REPO)


def test_bench_hang_then_retry_success(monkeypatch, capsys):
    # A transient hang on attempt 1 must not cost the headline: attempt 2's
    # real measurement line is forwarded verbatim.
    sys.path.insert(0, REPO)
    try:
        import bench
        good = json.dumps({"metric": "inference_images_per_sec_chip",
                           "value": 9000.0, "unit": "images/sec",
                           "vs_baseline": 18.0})
        attempts = []

        def fake_run(*a, **kw):
            attempts.append(1)
            if len(attempts) == 1:
                raise subprocess.TimeoutExpired(cmd="bench",
                                                timeout=kw["timeout"])
            return _FakeCompleted("noise\n" + good + "\n")

        monkeypatch.setattr(bench, "_wait_for_backend", lambda *a: True)
        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
        assert len(lines) == 1
        assert json.loads(lines[0])["value"] == 9000.0
    finally:
        sys.path.remove(REPO)


def test_bench_salvages_result_from_hung_childs_stdout(monkeypatch, capsys):
    # ADVICE r4 (medium): a child that prints the success JSON and THEN
    # hangs on interpreter exit (non-daemon RPC threads on a dead tunnel)
    # must not lose the measurement — the watchdog handler scans the
    # partial stdout (bytes, per TimeoutExpired semantics) and forwards it.
    sys.path.insert(0, REPO)
    try:
        import bench
        good = json.dumps({"metric": "inference_images_per_sec_chip",
                           "value": 8800.0, "unit": "images/sec",
                           "vs_baseline": 17.6})
        calls = []

        def fake_run(*a, **kw):
            calls.append(1)
            raise subprocess.TimeoutExpired(
                cmd="bench", timeout=kw["timeout"],
                output=("warmup\n" + good + "\n").encode())

        monkeypatch.setattr(bench, "_wait_for_backend", lambda *a: True)
        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
        assert len(calls) == 1  # salvaged on the first attempt, no retry
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["value"] == 8800.0
        assert "watchdog_note" in rec
    finally:
        sys.path.remove(REPO)


def test_bench_no_json_error_carries_stderr_tail(monkeypatch, capsys):
    # ADVICE r4 (low): a child that crashes without a JSON line must
    # forward a stderr tail so the traceback is not unrecoverable.
    sys.path.insert(0, REPO)
    try:
        import bench

        def fake_run(*a, **kw):
            return _FakeCompleted("", rc=1,
                                  stderr="Traceback...\nValueError: boom\n")

        monkeypatch.setattr(bench, "_wait_for_backend", lambda *a: True)
        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert "ValueError: boom" in rec["error"]
    finally:
        sys.path.remove(REPO)


def test_bench_malformed_json_line_not_forwarded(monkeypatch, capsys):
    # ADVICE r4 (low): only a line that PARSES as a JSON object with a
    # 'metric' key may be forwarded to the driver.
    sys.path.insert(0, REPO)
    try:
        import bench

        def fake_run(*a, **kw):
            return _FakeCompleted('{"metric": oops not json\n', rc=0)

        monkeypatch.setattr(bench, "_wait_for_backend", lambda *a: True)
        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
        assert len(lines) == 1
        rec = json.loads(lines[0])  # must be well-formed despite the child
        assert "error" in rec
    finally:
        sys.path.remove(REPO)


def test_bench_reprobes_backend_before_retry(monkeypatch, capsys):
    # ADVICE r4 (low): if the relay dies mid-run, the retry must fail fast
    # on a short re-probe instead of burning a second full watchdog window.
    sys.path.insert(0, REPO)
    try:
        import bench
        probes = []

        def fake_wait(budget=None):
            probes.append(budget)
            return budget is None  # initial probe OK, inter-attempt fails

        def fake_run(*a, **kw):
            raise subprocess.TimeoutExpired(cmd="bench", timeout=kw["timeout"])

        monkeypatch.setattr(bench, "_wait_for_backend", fake_wait)
        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
        assert probes == [None, 120.0]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert "backend lost" in rec["error"]
    finally:
        sys.path.remove(REPO)
