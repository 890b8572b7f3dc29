"""Stage attribution for the jitted train step (BASELINE config #3).

Times device-honest (chained-slope, tunnel-free) variants so train-step
regressions/levers can be pinned to a stage:

    full          — augment + encode + fwd/bwd + optimizer/EMA (the real step)
    no_augment    — augment skipped (host-prepared batch trains directly)
    encode_only   — target-grid encode alone
    augment_only  — the fused augmentation (warp + color + flip) alone
    fwdbwd_only   — loss fwd + bwd + grad_norm on precomputed targets
                    (no augment/encode/optimizer/EMA)
    fwd_only      — loss forward alone (no grad)

    python tools/train_split.py [--batch 32] [--config mpii_r18_384]

The gap full − (augment_only + encode_only + fwdbwd_only) ≈ optimizer +
EMA + bookkeeping. Ref: SURVEY.md §3.1 hot loop; VERDICT r2 next #2.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--stages", default="all",
                   help="comma list of stages to time (remote compiles "
                        "cost minutes each at B=128): any of full,"
                        "no_augment,augment,encode,fwd,fwdbwd,opt,"
                        "full_body — default all")
    args = p.parse_args(argv)
    stages = (set(args.stages.split(","))
              if args.stages != "all" else
              {"full", "no_augment", "augment", "encode", "fwd", "fwdbwd",
               "opt", "full_body"})

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from ppn_tpu.configs import get_config
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.data.pipeline import collate
    from ppn_tpu.ops import encode as enc
    from ppn_tpu.train import steps as st
    from ppn_tpu.train.loss import ppn_loss
    from ppn_tpu.utils.profiling import device_latency_ms

    cfg = get_config(args.config)
    if args.batch != cfg.train.batch_size:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch))
    m = cfg.model

    ds = SyntheticPoseDataset(cfg, size=args.batch, seed=0, cache=True)
    batch = collate([ds[i] for i in range(args.batch)])
    batch = {k: jax.device_put(v) for k, v in batch.items()
             if k in ("image", "keypoints", "visible", "bboxes", "valid")}

    graphdef, tstate, tx = st.create_train_state(cfg)

    full_step = st.make_train_step(cfg, graphdef, tx, augment=True)
    plain_step = st.make_train_step(cfg, graphdef, tx, augment=False)

    # ---- full / no_augment: real steps (donated state excluded from the
    # chained probe — time them as repeated dispatches on a fresh state) ----
    def timed_step(step):
        # the step donates its state argument — give each probe its own copy
        s = jax.tree.map(jnp.copy, tstate)
        s, terms = step(s, batch)      # compile + warmup
        float(jax.device_get(terms["loss_total"]))  # tunnel-safe sync
        import time
        n = args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            s, terms = step(s, batch)
        # block_until_ready on the remote-TPU tunnel can return before the
        # chain drains; a scalar fetch is the reliable sync (CLAUDE.md).
        float(jax.device_get(terms["loss_total"]))
        return (time.perf_counter() - t0) / n * 1e3

    def progress(msg):
        # remote compiles take minutes per program on this rig; emit stage
        # marks so a bounded-timeout caller can see where time went
        print(f"[train_split] {msg}", flush=True)

    t_full = t_noaug = None
    if "full" in stages:
        progress("timing full step (host loop)")
        t_full = timed_step(full_step)
        progress(f"full_step {t_full:.2f} ms")
    if "no_augment" in stages:
        progress("timing no-augment step")
        t_noaug = timed_step(plain_step)
        progress(f"no_augment {t_noaug:.2f} ms")

    # ---- pieces, chained-slope (stateless bodies) ------------------------
    from ppn_tpu.ops.augment import augment_batch
    rng = jax.random.PRNGKey(0)

    def augment_body(kp, vis, bb, val, img):
        out = augment_batch(m, cfg.data, rng, {
            "image": img, "keypoints": kp, "visible": vis,
            "bboxes": bb, "valid": val})
        return out["image"]

    d_aug = None
    if "augment" in stages:
        progress("timing augment_only (chained)")
        d_aug = device_latency_ms(
            augment_body, batch["keypoints"], batch["visible"],
            batch["bboxes"], batch["valid"], batch["image"],
            iters=args.iters)
        progress(f"augment_only {d_aug:.2f} ms")

    def encode_body(kp, vis, bb, val):
        t = enc.encode_batch(m, kp, vis, bb, val)
        return t.delta

    d_enc = None
    if "encode" in stages:
        d_enc = device_latency_ms(
            encode_body, batch["keypoints"], batch["visible"],
            batch["bboxes"], jnp.asarray(batch["valid"]), iters=args.iters)
        progress(f"encode_only {d_enc:.2f} ms")

    targets = jax.jit(enc.encode_batch, static_argnums=0)(
        m, batch["keypoints"], batch["visible"], batch["bboxes"],
        batch["valid"])
    jax.block_until_ready(targets.delta)

    params = jax.tree.map(jnp.copy, tstate.params)
    rest = jax.tree.map(jnp.copy, tstate.rest)

    def fwd_body(p, img):
        model = nnx.merge(graphdef, p, jax.tree.map(lambda x: x, rest))
        fm = model(img)
        total, _ = ppn_loss(m, fm, targets)
        return total

    def fwdbwd_body(p, img):
        def loss_fn(pp):
            model = nnx.merge(graphdef, pp, jax.tree.map(lambda x: x, rest))
            fm = model(img)
            total, _ = ppn_loss(m, fm, targets)
            return total

        total, grads = jax.value_and_grad(loss_fn)(p)
        import optax
        return total + optax.global_norm(grads)

    d_fwd = d_fwdbwd = None
    if "fwd" in stages:
        progress("timing fwd_only (chained)")
        d_fwd = device_latency_ms(fwd_body, params, batch["image"],
                                  iters=args.iters)
        progress(f"fwd_only {d_fwd:.2f} ms")
    if "fwdbwd" in stages:
        progress("timing fwdbwd_only")
        d_fwdbwd = device_latency_ms(fwdbwd_body, params, batch["image"],
                                     iters=max(4, args.iters // 2))
        progress(f"fwdbwd_only {d_fwdbwd:.2f} ms")

    # ---- optimizer + EMA alone: fixed grads, chained via one grad leaf ---
    import optax
    opt_state = tx.init(params)
    d_opt = None
    if "opt" in stages:
        grads = jax.jit(jax.grad(
            lambda p: fwd_body(p, batch["image"])))(params)
        jax.block_until_ready(jax.tree.leaves(grads)[0])
        gleaves, gtreedef = jax.tree.flatten(grads)

        def opt_body(leaf0):
            g = jax.tree.unflatten(gtreedef, [leaf0] + gleaves[1:])
            updates, _ = tx.update(g, opt_state, params)
            newp = optax.apply_updates(params, updates)
            d = cfg.train.ema_decay
            if d > 0:
                newp = jax.tree.map(lambda e, q: e * d + q * (1.0 - d),
                                    params, newp)
            return jax.tree.leaves(newp)[0]

        d_opt = device_latency_ms(opt_body, gleaves[0], iters=args.iters)
        progress(f"opt_ema_only {d_opt:.2f} ms")

    # ---- the WHOLE step as a chained stateless body: the device-honest
    # config-3 number (the host-timed full_step rows above carry the
    # tunnel's per-dispatch pytree-enqueue overhead) -----------------------
    def full_body(kp, vis, bb, val, img):
        out = augment_batch(m, cfg.data, rng, {
            "image": img, "keypoints": kp, "visible": vis,
            "bboxes": bb, "valid": val})
        t = enc.encode_batch(m, out["keypoints"], out["visible"],
                             out["bboxes"], out["valid"])

        def loss_fn(pp):
            model = nnx.merge(graphdef, pp, jax.tree.map(lambda x: x, rest))
            fmap = model(out["image"])
            total, _ = ppn_loss(m, fmap, t)
            return total

        total, g = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(g, opt_state, params)
        newp = optax.apply_updates(params, updates)
        d = cfg.train.ema_decay
        if d > 0:
            newp = jax.tree.map(lambda e, q: e * d + q * (1.0 - d),
                                params, newp)
        return total + optax.global_norm(g) + jax.tree.leaves(newp)[0].sum()

    d_full = None
    if "full_body" in stages:
        progress("timing full_body")
        d_full = device_latency_ms(
            full_body, batch["keypoints"], batch["visible"],
            batch["bboxes"], batch["valid"], batch["image"],
            iters=max(4, args.iters // 2))
        progress(f"full_body {d_full:.2f} ms")

    r3 = lambda v: None if v is None else round(v, 3)  # noqa: E731
    out = {
        "config": cfg.name, "batch": args.batch,
        "backend": jax.default_backend(),
        "full_step_ms": r3(t_full),
        "full_step_images_per_sec": (
            round(args.batch / t_full * 1e3, 1) if t_full else None),
        "no_augment_step_ms": r3(t_noaug),
        "device_ms": {
            "augment_only": r3(d_aug),
            "encode_only": r3(d_enc),
            "fwd_only": r3(d_fwd),
            "fwdbwd_only": r3(d_fwdbwd),
            "opt_ema_only": r3(d_opt),
            "full_body": r3(d_full),
        },
        "device_images_per_sec": round(args.batch / d_full * 1e3, 1)
        if d_full else None,
        "residual_ms_optimizer_ema_bookkeeping": round(
            t_full - d_aug - d_enc - d_fwdbwd, 3)
        if None not in (t_full, d_aug, d_enc, d_fwdbwd) else None,
        "note": "full/no_augment are per-dispatch host timings (include "
                "~1-2 ms tunnel floor on this rig); device_ms rows are "
                "chained-slope device-only",
    }
    print(json.dumps(out))
    from tools._artifact import write_artifact

    write_artifact(out, "train_split", getattr(args, "out", None))
    return 0


if __name__ == "__main__":
    sys.exit(main())
