"""Crowded-scene parsing characterization (SURVEY.md §6 config 4;
VERDICT r3 directive #7).

For each crowding level (fixed persons-per-image protocols, plus the
random-1..12 stress protocol) this computes three numbers on the same
held-out synthetic scenes:

1. **collision bound** — a parser-independent upper bound on PCKh from
   grid-cell collisions alone: persons whose instance centers share a
   stride cell can produce only one instance proposal (the other person
   is unrecoverable), and same-class keypoints sharing a cell encode to
   one proposal (the other person's joint is credited only if the kept
   joint happens to fall within its 0.5·headsize). Kept-candidate choices
   are made optimally, so this bounds ANY decode/NMS/parse stack over
   this grid.
2. **oracle ceiling** — GT-perfect feature maps through the real
   decode/NMS/parse pipeline (tools/oracle_ceiling.py semantics), per
   NMS operating point.
3. **model PCKh** — the committed hero snapshot through the same
   pipeline (optional, --snapshot), per operating point; the forward
   pass runs once per protocol and the feature maps are cached so the
   operating-point sweep only re-runs postprocess.

ceiling/bound tells you whether a PCKh collapse is grid-cell collision
(encode-fundamental: ceiling ≈ bound) or parser regime (ceiling ≪
bound); model/ceiling is the learned-localization gap.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python \
        tools/crowding_study.py --snapshot artifacts/coco_hero_r3_ema_f16.npz \
        --out artifacts/crowding_study_r4.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collision_bound(m, ds, size):
    """Parser-independent PCKh upper bound from grid collisions (see
    module docstring). Returns (bound, lost_person_frac)."""
    from ppn_tpu.eval.runner import synthetic_headsizes

    sy, sx = m.stride
    tot = 0
    credit = 0.0
    persons = 0
    lost_persons = 0
    for i in range(size):
        s = ds[i]
        idx = np.where(s["valid"])[0]
        kps, vis, bb = s["keypoints"], s["visible"], s["bboxes"]
        headsz = synthetic_headsizes(bb)
        persons += len(idx)
        tot += int(vis[idx].sum())

        # instance-cell groups: keep the member with the most visible
        # joints (optimal for the bound since lost persons credit 0)
        groups = {}
        for g in idx:
            cell = (int(bb[g, 1] // sy), int(bb[g, 0] // sx))
            groups.setdefault(cell, []).append(g)
        survivors = []
        for members in groups.values():
            keep = max(members, key=lambda g: int(vis[g].sum()))
            survivors.append(keep)
            lost_persons += len(members) - 1

        # per-class keypoint-cell groups among surviving persons
        K = m.num_keypoints
        for k in range(K):
            cells = {}
            for g in survivors:
                if not vis[g, k]:
                    continue
                cell = (int(kps[g, k, 1] // sy), int(kps[g, k, 0] // sx))
                cells.setdefault(cell, []).append(g)
            for members in cells.values():
                if len(members) == 1:
                    credit += 1.0
                    continue
                best = 0
                for kept in members:  # optimal kept-joint choice
                    c = sum(
                        1 for g in members
                        if np.hypot(*(kps[g, k] - kps[kept, k]))
                        < 0.5 * max(headsz[g], 1e-6))
                    best = max(best, c)
                credit += best
    return credit / max(tot, 1), lost_persons / max(persons, 1)


def eval_fms(m, fms, ds, size, batch):
    """PCKh of cached feature maps through the current-cfg postprocess."""
    from ppn_tpu.eval.pckh import PCKhEvaluator
    from ppn_tpu.eval.runner import synthetic_headsizes
    from ppn_tpu.ops import postprocess as post

    ev = PCKhEvaluator(m)
    for s0 in range(0, size, batch):
        fm = fms[s0:s0 + batch]
        ppl = jax.device_get(post.postprocess_batch(m, fm))
        for j in range(fm.shape[0]):
            s = ds[s0 + j]
            one = jax.tree.map(lambda x, j=j: x[j], ppl)
            ev.add_image(one, s["keypoints"], s["visible"], s["bboxes"],
                         s["valid"], synthetic_headsizes(s["bboxes"]))
    return ev.summarize()["pckh/mean"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="coco_r18_384")
    p.add_argument("--snapshot", default=None,
                   help="inference npz for model PCKh (else oracle-only)")
    p.add_argument("--protocols", default="1,2,3,4,5,6,0",
                   help="comma list of persons/image; 0 = random 1..max")
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--seed", type=int, default=10_000)
    p.add_argument("--det", type=float, default=0.02,
                   help="detection threshold for the model sweep (the "
                        "hero's best point; oracle scores are ~1.0 so det "
                        "does not bind there)")
    p.add_argument("--nms-grid", default="0.3,0.45,0.6")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from ppn_tpu.configs import get_config
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.ops import encode as enc

    cfg = get_config(args.config)
    nms_grid = [float(x) for x in args.nms_grid.split(",")]

    forward = state = None
    if args.snapshot:
        from ppn_tpu.train import steps as st
        from ppn_tpu.utils.params_io import load_inference_npz

        graphdef, state = load_inference_npz(cfg, args.snapshot)
        forward = st.make_forward(cfg, graphdef)

    results = []
    for proto in (int(x) for x in args.protocols.split(",")):
        np_ = proto if proto > 0 else None
        ds = SyntheticPoseDataset(cfg, size=args.size, seed=args.seed,
                                  num_persons=np_)
        label = (f"{proto}_person" if np_ else
                 f"random_1_to_{cfg.data.max_persons}")
        bound, lost_frac = collision_bound(cfg.model, ds, args.size)

        # GT-perfect feature maps (oracle) — built once per protocol
        gt_fms = np.stack([
            np.asarray(enc.targets_to_feature_map(cfg.model,
                enc.encode_single(cfg.model, ds[i]["keypoints"],
                                  ds[i]["visible"], ds[i]["bboxes"],
                                  ds[i]["valid"])))
            for i in range(args.size)])

        # model feature maps — forward once per protocol, cached
        model_fms = None
        if forward is not None:
            outs = []
            for s0 in range(0, args.size, args.batch_size):
                imgs = np.stack([ds[i]["image"] for i in
                                 range(s0, min(s0 + args.batch_size,
                                               args.size))])
                outs.append(np.asarray(jax.device_get(
                    forward(state, imgs)), np.float32))
            model_fms = np.concatenate(outs)

        points = []
        for nms in nms_grid:
            m = dataclasses.replace(cfg.model, detection_thresh=args.det,
                                    nms_thresh=nms)
            ceiling = eval_fms(m, gt_fms, ds, args.size, args.batch_size)
            rec = {"det": args.det, "nms": nms,
                   "oracle_ceiling": round(ceiling, 4)}
            if model_fms is not None:
                model = eval_fms(m, model_fms, ds, args.size,
                                 args.batch_size)
                rec["model_pckh"] = round(model, 4)
                rec["model_over_ceiling"] = round(
                    model / max(ceiling, 1e-9), 4)
            points.append(rec)
            print(f"{label} nms={nms}: {rec}", flush=True)

        best = max(points, key=lambda r: r.get("model_pckh",
                                               r["oracle_ceiling"]))
        results.append({
            "protocol": label,
            "images": args.size,
            "collision_bound": round(bound, 4),
            "lost_person_frac": round(lost_frac, 4),
            "points": points,
            "best_point": best,
            "ceiling_over_bound": round(
                max(pt["oracle_ceiling"] for pt in points)
                / max(bound, 1e-9), 4),
        })
        print(f"{label}: bound={bound:.4f} best={best}", flush=True)

    out = {"config": args.config, "seed": args.seed,
           "snapshot": args.snapshot, "results": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")
    else:
        print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
