"""Probe: which packed_views component costs what, and can the e-view
transpose be decomposed into TPU-friendly steps?

The e view moves the minor dim (NW) out and the cell dim N in — a
worst-case XLA transpose. Candidate decomposition: one clean 2D
transpose (the only real data movement) + minor-preserving permutes
(near-bandwidth on TPU) + pad.

    python tools/view_probe.py [--batch 128] [--q 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--q", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ppn_tpu.configs import get_config
    from ppn_tpu.ops.pallas_post_packed import group_size, packed_views

    cfg = get_config(args.config).model
    H, W = cfg.outsize
    K1, L = cfg.num_classes, cfg.num_limbs
    N = H * W
    NW = cfg.local_grid_size[0] * cfg.local_grid_size[1]
    G = group_size(cfg, args.q)
    B = args.batch
    Bp = -(-B // G) * G
    nb = Bp // G
    Npad = -(-N // 128) * 128
    q = args.q

    rng = np.random.default_rng(0)
    fm = jax.device_put(rng.normal(0, 2, (B, H, W, cfg.num_channels)
                                   ).astype(np.float32))

    def timed(fn, probe):
        o = fn(fm)
        jax.block_until_ready(o)
        float(jax.device_get(probe(o)))

        def once():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(fm)
            jax.block_until_ready(o)
            float(jax.device_get(probe(o)))
            return (time.perf_counter() - t0) / args.iters

        once()
        return round(min(once() for _ in range(3)) * 1e3, 3)

    results = {}

    # current full views (bf16 path: rowq + e only)
    views_fn = jax.jit(lambda x: packed_views(cfg, x, exact_bf16=True, q=q))
    results["views_now"] = timed(views_fn, lambda o: o[1][0, 0, 0])

    def prep(x):
        fmb = x.astype(jnp.bfloat16)
        if Bp != B:
            fmb = jnp.pad(fmb, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
        return fmb.reshape(Bp, N, cfg.num_channels)

    # rowq view alone
    def rowq_only(x):
        fmb = prep(x)
        logits = fmb[..., :6 * K1].reshape(nb, G, N, 6, K1)
        rowq = jnp.transpose(logits, (0, 3, 4, 1, 2)).reshape(
            nb, 6, K1 * G, N)
        rowq = jnp.pad(rowq, ((0, 0), (0, 0), (0, q - K1 * G),
                              (0, Npad - N)))
        return rowq.reshape(nb, 6 * q, Npad)

    results["rowq_only"] = timed(jax.jit(rowq_only), lambda o: o[0, 0, 0])

    # e view alone, current formulation
    def e_now(x):
        fmb = prep(x)
        e = fmb[..., 6 * K1:].reshape(nb, G, N, L, NW)
        e = jnp.transpose(e, (0, 4, 3, 1, 2)).reshape(nb, NW, L * G, N)
        return jnp.pad(e, ((0, 0), (0, 0), (0, q - L * G), (0, Npad - N)))

    results["e_now"] = timed(jax.jit(e_now), lambda o: o[0, 0, 0, 0])

    # e view, decomposed: 2D transpose then minor-preserving permutes
    def e_decomp(x):
        fmb = prep(x)
        el = fmb[..., 6 * K1:]                      # (Bp, N, L*NW)
        # the one real relayout: per-image 2D transpose, minor N in
        et = jnp.transpose(el, (0, 2, 1))           # (Bp, L*NW, N)
        et = et.reshape(nb, G, L, NW, N)
        # minor-preserving permute: N stays minor
        e = jnp.transpose(et, (0, 3, 2, 1, 4)).reshape(nb, NW, L * G, N)
        return jnp.pad(e, ((0, 0), (0, 0), (0, q - L * G), (0, Npad - N)))

    results["e_decomp"] = timed(jax.jit(e_decomp), lambda o: o[0, 0, 0, 0])

    # sanity: identical values
    a = jax.device_get(jax.jit(e_now)(fm))
    b = jax.device_get(jax.jit(e_decomp)(fm))
    results["e_decomp_bitwise"] = bool((a == b).all())

    # e as one flat 2D transpose of the whole limb block
    def e_flat2d(x):
        fmb = prep(x)
        el = fmb[..., 6 * K1:].reshape(Bp * N, L * NW)
        return jnp.transpose(el, (1, 0))            # (L*NW, Bp*N)

    results["e_flat2d"] = timed(jax.jit(e_flat2d), lambda o: o[0, 0])

    # pure per-image 2D transpose cost (the floor for any decomposition)
    def t2d(x):
        fmb = prep(x)
        return jnp.transpose(fmb, (0, 2, 1))        # (Bp, C, N)

    results["fm_t2d"] = timed(jax.jit(t2d), lambda o: o[0, 0, 0])

    # e as the layout a kernel could DMA per (offset, block) WITHOUT any
    # (j, l) reorder: one flat 2D transpose + lane pad, rows l·NW+j kept
    # in source order, blocks/images/cells as trailing dims.
    def e_flat_pad(x):
        fmb = prep(x)
        el = fmb[..., 6 * K1:].reshape(Bp * N, L * NW)
        et = jnp.transpose(el, (1, 0)).reshape(L * NW, Bp, N)
        et = jnp.pad(et, ((0, 0), (0, 0), (0, Npad - N)))
        return et.reshape(L, NW, nb, G, Npad)

    results["e_flat_pad"] = timed(jax.jit(e_flat_pad),
                                  lambda o: o[0, 0, 0, 0, 0])

    # value check vs current: e_now[b, j, l*G+g, n] == e_flat_pad[l, j, b, g, n]
    a = jax.device_get(jax.jit(e_now)(fm))
    c = jax.device_get(jax.jit(e_flat_pad)(fm))
    ok = True
    for b_i in (0, nb - 1):
        for j in (0, NW - 1):
            want = a[b_i, j, :L * G].reshape(L, G, Npad)
            ok = ok and (want == c[:, j, b_i]).all()
    results["e_flat_pad_bitwise"] = bool(ok)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
