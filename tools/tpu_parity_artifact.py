"""Record an on-hardware Pallas-vs-XLA postprocess parity artifact.

CI runs the fused postprocess kernel in Pallas interpret mode on CPU
(tests/test_pallas_post.py); this script runs the COMPILED kernel on the
real TPU chip against the XLA pipeline on the same chip and writes the
elementwise comparison to artifacts/tpu_pallas_parity.json — evidence,
not a claim (VERDICT r1 missing #6).

Run (serialized with other TPU jobs, per CLAUDE.md):
    python tools/tpu_parity_artifact.py
"""

from __future__ import annotations

import datetime
import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ppn_tpu.configs import get_config  # noqa: E402
from ppn_tpu.data.synthetic import random_people  # noqa: E402
from ppn_tpu.ops import encode as enc  # noqa: E402
from ppn_tpu.ops import postprocess as post  # noqa: E402
from ppn_tpu.ops.pallas_post import postprocess_batch_pallas  # noqa: E402
from ppn_tpu.ops.pallas_post_packed import (  # noqa: E402
    postprocess_batch_packed)


def compare(cfg, fm, interpret: bool, packed: bool = False,
            exact_bf16: bool = False) -> dict:
    want = jax.device_get(post.postprocess_batch(cfg, fm))
    if packed:
        got = jax.device_get(postprocess_batch_packed(
            cfg, fm, interpret, exact_bf16=exact_bf16))
    else:
        got = jax.device_get(postprocess_batch_pallas(cfg, fm, interpret))
    out = {}
    ok = True
    for name in want._fields:
        a = np.asarray(getattr(got, name))
        b = np.asarray(getattr(want, name))
        if a.dtype.kind == "f":
            diff = float(np.max(np.abs(a - b))) if a.size else 0.0
            field_ok = bool(np.allclose(a, b, rtol=1e-4, atol=1e-4))
        else:
            diff = int(np.sum(a != b))
            field_ok = diff == 0
        out[name] = {"max_abs_diff" if a.dtype.kind == "f" else
                     "num_mismatch": diff, "ok": field_ok}
        ok = ok and field_ok
    out["ok"] = ok
    return out


def main():
    backend = jax.default_backend()
    interpret = backend not in ("tpu", "axon")
    if interpret:
        print(f"warning: backend is {backend!r}, not a TPU — running the "
              "kernel in interpret mode; artifact will say so",
              file=sys.stderr)

    results = {
        "backend": backend,
        "kernel_mode": "interpret" if interpret else "compiled",
        "device": str(jax.devices()[0]),
        "jax": jax.__version__,
        "date": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "cases": {},
    }

    for cname in ("mpii_r18_384", "coco_r18_384"):
        cfg = get_config(cname).model
        rng = np.random.default_rng(0)
        fm = rng.normal(0, 2, (2, *cfg.outsize, cfg.num_channels)).astype(
            np.float32)
        fm = jax.device_put(fm)
        results["cases"][f"{cname}/random"] = compare(cfg, fm, interpret)
        print(f"{cname}/random: ok={results['cases'][f'{cname}/random']['ok']}")

        # batch-packed kernel (G images per grid step), f32 and bf16-exact
        # prep views (the serving path; lossless for model-produced maps)
        fmb = rng.normal(0, 2, (16, *cfg.outsize, cfg.num_channels)).astype(
            np.float32)
        fmb_exact = np.asarray(
            jax.numpy.asarray(fmb, jax.numpy.bfloat16).astype(
                jax.numpy.float32))
        for tag, arr, bf in ((f"{cname}/packed", fmb, False),
                             (f"{cname}/packed_bf16", fmb_exact, True)):
            results["cases"][tag] = compare(
                cfg, jax.device_put(arr), interpret, packed=True,
                exact_bf16=bf)
            print(f"{tag}: ok={results['cases'][tag]['ok']}")

    # oracle-perfect scene: GT-derived feature map must reparse identically
    cfg = get_config("mpii_r18_384").model
    rng = np.random.default_rng(7)
    s = random_people(rng, cfg, max_persons=3, num_persons=2)
    t = enc.encode_single(cfg, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    fm = jax.device_put(np.asarray(enc.targets_to_feature_map(cfg, t))[None])
    results["cases"]["mpii_r18_384/oracle"] = compare(cfg, fm, interpret)
    print(f"oracle: ok={results['cases']['mpii_r18_384/oracle']['ok']}")

    results["ok"] = all(c["ok"] for c in results["cases"].values())
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "tpu_pallas_parity.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}: ok={results['ok']}")
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
