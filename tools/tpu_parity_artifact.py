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
            exact_bf16: bool = False, q: int = 128, got=None) -> dict:
    want = jax.device_get(post.postprocess_batch(cfg, fm))
    if got is not None:
        got = jax.device_get(got)
    elif packed:
        got = jax.device_get(postprocess_batch_packed(
            cfg, fm, interpret, exact_bf16=exact_bf16, q=q))
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

    # wide quantity blocks (the B=128 serving width): q=512 packs G=30
    # images per grid step; decisions must be identical
    cfg = get_config("mpii_r18_384").model
    rng = np.random.default_rng(1)
    fmw = rng.normal(0, 2, (33, *cfg.outsize, cfg.num_channels)).astype(
        np.float32)
    fmw = np.asarray(jax.numpy.asarray(fmw, jax.numpy.bfloat16).astype(
        jax.numpy.float32))
    results["cases"]["mpii_r18_384/packed_bf16_q512"] = compare(
        cfg, jax.device_put(fmw), interpret, packed=True, exact_bf16=True,
        q=512)
    print("packed_bf16_q512: ok="
          f"{results['cases']['mpii_r18_384/packed_bf16_q512']['ok']}")

    # COCO wide blocks at the crowded operating point (VERDICT r4
    # directive #5): K=17/L=18 changes the packing geometry vs MPII, and
    # the crowded preset moves the decision thresholds (det 0.02 /
    # nms 0.6) — decisions must still be identical at q=512.
    ccfg = get_config("coco_r18_384_crowded").model
    rng = np.random.default_rng(3)
    fmc = rng.normal(0, 2, (33, *ccfg.outsize, ccfg.num_channels)).astype(
        np.float32)
    fmc = np.asarray(jax.numpy.asarray(fmc, jax.numpy.bfloat16).astype(
        jax.numpy.float32))
    results["cases"]["coco_r18_384_crowded/packed_bf16_q512"] = compare(
        ccfg, jax.device_put(fmc), interpret, packed=True, exact_bf16=True,
        q=512)
    print("coco_crowded packed_bf16_q512: ok="
          f"{results['cases']['coco_r18_384_crowded/packed_bf16_q512']['ok']}")

    # transposed-head serving path (nn/model.py packed_feature): the head
    # GEMM must be bitwise the 1x1 conv, and the fused packed decisions
    # must match the XLA oracle on the standard forward's feature map
    from flax import nnx  # noqa: E402

    from ppn_tpu.ops.postprocess import (  # noqa: E402
        forward_postprocess_packed_fn)
    from ppn_tpu.train import steps as st  # noqa: E402

    full_cfg = get_config("mpii_r18_384")
    model = st.create_model(full_cfg)
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    rng = np.random.default_rng(2)
    images = jax.device_put(rng.random(
        (32, *full_cfg.model.insize, 3), np.float32))

    @jax.jit
    def packed_pipeline(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        return forward_postprocess_packed_fn(full_cfg.model, m, images,
                                             q=512)

    @jax.jit
    def standard_fm(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        return m(images)

    fm_std = standard_fm(params, rest, images)
    case = compare(full_cfg.model, fm_std, interpret,
                   got=packed_pipeline(params, rest, images))
    # head-GEMM bitwise check: reassembled packed logits == standard fm
    # cast to bf16 (the exact values the serving kernel consumed)
    from ppn_tpu.ops.pallas_post_packed import (  # noqa: E402
        group_size, group_stride)

    @jax.jit
    def packed_fm(params, rest, images):
        import jax.numpy as jnp
        m = nnx.merge(graphdef, params, rest)
        box_t, e_t = m.packed_feature(images, q=512)
        mc = full_cfg.model
        H, W = mc.outsize
        N = H * W
        G, Gp = group_size(mc, 512), group_stride(mc, 512)
        f = jnp.concatenate([box_t, e_t], axis=0)
        C = f.shape[0]
        f = f.reshape(C, -1, Gp, f.shape[-1])[:, :, :G].reshape(
            C, -1, f.shape[-1])
        f = jnp.transpose(f[:, :images.shape[0], :N], (1, 2, 0))
        return f.reshape(images.shape[0], H, W, C)

    a = np.asarray(jax.device_get(packed_fm(params, rest, images)),
                   np.float32)
    b = np.asarray(jax.device_get(fm_std), np.float32)
    b = np.asarray(jax.numpy.asarray(b, jax.numpy.bfloat16).astype(
        jax.numpy.float32))
    # The transposed head GEMM is the same bf16 contraction as the 1x1
    # conv but the TPU conv lowering accumulates in a different pass
    # order, so logits agree only up to 1 bf16 ulp (measured: every dot
    # formulation — either operand order, f32-preferred accumulate,
    # f32 bias — gives the IDENTICAL diff pattern vs the conv, so the
    # residue is conv-lowering-internal, not fixable from the dot side).
    # The tested serving contract is decision-level parity (fields above,
    # all bitwise); the ulp stats are recorded as evidence.
    case["head_gemm_frac_exact_vs_conv_bf16"] = float((a == b).mean())
    case["head_gemm_max_abs_diff"] = float(np.abs(a - b).max())
    big = np.abs(b) >= 1e-2
    case["head_gemm_max_rel_diff_above_1e-2"] = float(
        (np.abs(a - b)[big] / np.abs(b)[big]).max())
    results["cases"]["mpii_r18_384/packed_head_serving"] = case
    print(f"packed_head_serving: ok={case['ok']} (head frac exact: "
          f"{case['head_gemm_frac_exact_vs_conv_bf16']:.4f}, max rel "
          f"{case['head_gemm_max_rel_diff_above_1e-2']:.2e})")

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
