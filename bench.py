"""Benchmark harness — BASELINE config #2-style batched inference throughput.

Measures steady-state images/sec/chip for the flagship pipeline: ResNet-18
forward + on-device decode + per-class NMS + greedy limb parsing, all inside
one jitted function (images resident on device, as a serving loop would keep
them after on-device preprocessing).

Headline batch is the serving batch B=128 (VERDICT r1 weak #5: B=32 leaves
~40% of the achievable throughput on the table); override with
PPN_BENCH_BATCH. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "batch", "mfu_pct", ...} with
vs_baseline = value / 500 (the ≥500 img/s/chip BASELINE.json target) and
mfu_pct = achieved FLOP/s over the chip's bf16 peak (PPN_PEAK_TFLOPS,
default 197 = TPU v5e).

The headline `value` is DEVICE throughput (chained-slope timing — one
dispatch runs K serially-chained pipeline iterations, the slope between K
and 2K cancels fixed per-dispatch cost; `utils/profiling.device_latency_ms`).
On this rig the chip sits behind a remote tunnel with a ~1.8 ms dispatch
floor, so a host-side dispatch loop measures the tunnel, not the chip
(VERDICT r2 weak #3); the host-loop number is still reported as
`host_loop_images_per_sec` (includes tunnel RTT).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _probe_backend(timeout_s: float) -> bool:
    """True iff `jax.devices()` succeeds in a fresh subprocess within
    `timeout_s`. A subprocess is mandatory: when the axon relay is down,
    backend init hangs for minutes and is not interruptible in-process
    (CLAUDE.md outage playbook)."""
    code = "import jax; jax.devices(); print('PPN_BACKEND_OK')"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=max(5.0, timeout_s),
                           capture_output=True, text=True)
        return r.returncode == 0 and "PPN_BACKEND_OK" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def _wait_for_backend(budget_s: float | None = None) -> bool:
    """Poll backend availability for a bounded window (default 10 min,
    override PPN_BENCH_PROBE_BUDGET_S). Returns False if it never comes up
    — the caller then emits the single JSON line with an error field
    instead of dying with a traceback (VERDICT r3 weak #1: an unhandled
    RuntimeError out of jax.devices() cost round 3 its driver-captured
    headline)."""
    budget = (budget_s if budget_s is not None
              else float(os.environ.get("PPN_BENCH_PROBE_BUDGET_S", "600")))
    deadline = time.time() + budget
    per_probe = min(45.0, budget)
    while True:
        if _probe_backend(per_probe):
            return True
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        time.sleep(min(15.0, max(1.0, remaining)))


def _emit_error(reason: str) -> None:
    """Still print the ONE parseable JSON line on failure (rc stays 0 so
    the driver records an artifact, not a stack trace)."""
    print(json.dumps({
        "metric": "inference_images_per_sec_chip",
        "value": 0.0,
        "unit": "images/sec",
        "vs_baseline": 0.0,
        "error": reason,
    }))


def run_bench():
    import jax
    import numpy as np
    from flax import nnx

    from ppn_tpu.configs import get_config
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.train import steps as st

    cfg = get_config("mpii_r18_384")
    batch = int(os.environ.get("PPN_BENCH_BATCH", "128"))

    model = st.create_model(cfg)
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    @jax.jit
    def pipeline(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        # Fused fast path: on TPU wide batches the head GEMM emits the
        # packed kernel's views directly (no relayout, no f32 upcast).
        people = post.forward_postprocess_fast_fn(cfg.model, m, images)
        return people.kp_box, people.kp_score, people.valid

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((batch, *cfg.model.insize, 3), np.float32))

    # Warmup / compile.
    out = pipeline(params, rest, images)
    jax.block_until_ready(out)
    jax.device_get(out[2])

    # FLOPs per batch from the compiler's cost model (falls back to the
    # analytic ResNet-18@384 forward estimate if unavailable).
    try:
        cost = pipeline.lower(params, rest, images).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception:
        flops = 10.7e9 * batch

    # Steady state: chain iters calls, fetch a small leaf to synchronize.
    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipeline(params, rest, images)
        jax.block_until_ready(out)
        jax.device_get(out[2])
        return time.perf_counter() - t0

    timed(3)  # settle
    iters = 30
    t = min(timed(iters) for _ in range(3))
    host_ips = batch * iters / t

    # Device-honest headline: chained-slope latency excludes the tunnel's
    # fixed per-dispatch cost (~1.8 ms/call on this rig).
    from ppn_tpu.utils.profiling import device_latency_ms

    def body(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        return post.forward_postprocess_fast_fn(cfg.model, m, images)

    dev_ms = device_latency_ms(body, params, rest, images, iters=10)
    ips = batch / dev_ms * 1e3

    peak = float(os.environ.get("PPN_PEAK_TFLOPS", "197")) * 1e12
    mfu = (flops / batch) * ips / peak * 100.0

    print(json.dumps({
        "metric": "inference_images_per_sec_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / 500.0, 4),
        "batch": batch,
        "mfu_pct": round(mfu, 2),
        "device_batch_ms": round(dev_ms, 3),
        "host_loop_images_per_sec": round(host_ips, 2),
        "host_loop_includes_tunnel_rtt": True,
    }))


def _run_child() -> None:
    """Child mode: do the actual measurement, print the success JSON line."""
    try:
        run_bench()
    except Exception as e:  # noqa: BLE001 — one JSON line, whatever happens
        _emit_error(f"{type(e).__name__}: {e}"[:300])


def _as_text(s) -> str:
    """TimeoutExpired.stdout/.stderr are bytes even under text=True."""
    if s is None:
        return ""
    return s.decode(errors="replace") if isinstance(s, bytes) else s


def _extract_json_line(text: str):
    """(line, parsed) for the last stdout line that parses as a JSON object
    with a 'metric' key; (None, None) if absent. Parsing (not substring
    matching) guarantees anything forwarded to the driver is well-formed."""
    for line in reversed(text.splitlines()):
        line = line.strip()
        if not (line.startswith("{") and '"metric"' in line):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return line, obj
    return None, None


def main():
    if os.environ.get("PPN_BENCH_CHILD"):
        _run_child()
        return
    if not _wait_for_backend():
        _emit_error("tpu_unavailable")
        return

    # The tunneled backend can hang *after* a successful probe (observed
    # 2026-08-20: warmup dispatch stuck >30 min, zero open sockets, relay
    # healthy — the RPC died silently). An exception guard can't catch a
    # hang, so run the measurement in a bounded subprocess and retry once:
    # the hang is transient (fresh probes succeed while a stuck run waits).
    # Budget must cover a cold remote compile of the fused Pallas pipeline
    # (historically up to ~5 min; generous default for slow sessions).
    # Worst-case wall time: probe budget (600 s) + 2 × watchdog (2 × 1200 s)
    # + one short inter-attempt re-probe (120 s) ≈ 52 min.
    budget = float(os.environ.get("PPN_BENCH_WATCHDOG_S", "1200"))
    env = dict(os.environ, PPN_BENCH_CHILD="1")
    last = "tpu_hang: measurement exceeded watchdog twice"
    for attempt in range(2):
        if attempt and not _wait_for_backend(
                float(os.environ.get("PPN_BENCH_RETRY_PROBE_S", "120"))):
            # The relay died mid-run: don't burn a second full watchdog
            # window on a backend that can't even probe.
            last = "tpu_unavailable: backend lost between attempts"
            break
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               timeout=budget, capture_output=True,
                               text=True, env=env)
        except subprocess.TimeoutExpired as e:
            # The child may have printed its success line and then hung on
            # interpreter exit (non-daemon RPC threads on a dead tunnel) —
            # salvage the measurement instead of reporting a hang.
            line, obj = _extract_json_line(_as_text(e.stdout))
            if obj is not None and "error" not in obj:
                obj["watchdog_note"] = ("child hung after printing result; "
                                        "killed by watchdog")
                print(json.dumps(obj))
                return
            last = (f"tpu_hang: measurement exceeded {budget:.0f}s "
                    "watchdog (backend probe was OK)")
            continue
        line, obj = _extract_json_line(_as_text(r.stdout))
        if obj is None:
            tail = _as_text(r.stderr)[-200:].replace("\n", " ")
            last = (f"bench child rc={r.returncode}, no JSON line"
                    + (f"; stderr tail: {tail}" if tail else ""))
            continue
        if "error" in obj and attempt == 0:
            last = line  # transient child failure — retry once
            continue
        print(line)
        return
    if last.startswith("{"):
        print(last)  # forward the child's own error JSON line
    else:
        _emit_error(last)


if __name__ == "__main__":
    main()
