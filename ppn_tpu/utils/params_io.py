"""Portable inference-weights snapshots (.npz) — the committable artifact
format.

Orbax checkpoints carry the full TrainState (optimizer moments, EMA copy,
rng) — 4-5x the parameter bytes — and their OCDBT layout is opaque to
review. For shipping *inference* weights inside the repo (VERDICT r3
directive #4: accuracy claims must not depend on /tmp surviving), this
module stores just (eval params, BatchNorm stats) as one compressed npz,
float32 leaves downcast to float16 (all PPN weight magnitudes are < 2^6,
far inside f16 range; the pinned-accuracy test pins the post-quantization
number, so the artifact is self-consistent by construction).

The reference's analog is ``torch.save(model.state_dict())`` snapshots
distributed out-of-band (ref:train.py†, SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


def save_inference_npz(path: str, state, float_dtype=np.float16) -> int:
    """Write the eval params (EMA when tracked) + BN stats. Returns the
    number of leaves written."""
    from ppn_tpu.train.steps import eval_params

    tree = {"params": eval_params(state), "rest": state.rest}
    leaves = jax.tree.leaves(jax.device_get(tree))
    arrs = {}
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if a.dtype == np.float32:
            a = a.astype(float_dtype)
        arrs[f"leaf_{i:04d}"] = a
    np.savez_compressed(path, **arrs)
    return len(leaves)


def _load_leaves(path: str, tmpl_leaves):
    """Snapshot leaves validated (count, shapes) against a template list;
    float leaves upcast back to the template dtype so jitted signatures
    match the live pipeline's."""
    with np.load(path) as z:
        names = sorted(z.files)
        if len(names) != len(tmpl_leaves):
            raise ValueError(
                f"{path} holds {len(names)} leaves, this config expects "
                f"{len(tmpl_leaves)} — wrong config for this snapshot?")
        new = []
        for name, tmpl in zip(names, tmpl_leaves):
            a = z[name]
            if a.shape != tmpl.shape:
                raise ValueError(
                    f"{path}:{name} shape {a.shape} != expected "
                    f"{tmpl.shape}")
            new.append(np.asarray(a, dtype=np.asarray(tmpl).dtype))
    return new


def load_inference_npz(cfg, path: str):
    """(graphdef, state) with the snapshot's params in the params slot
    (ema_params=None — eval_params() then uses them directly)."""
    from ppn_tpu.train import steps as st

    ecfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.0))
    graphdef, state, _ = st.create_train_state(ecfg)
    tree = {"params": state.params, "rest": state.rest}
    tmpl_leaves, treedef = jax.tree.flatten(tree)
    tree = jax.tree.unflatten(treedef, _load_leaves(path, tmpl_leaves))
    state = dataclasses.replace(state, params=tree["params"],
                                rest=tree["rest"])
    return graphdef, state


def load_npz_into_train_state(path: str, state):
    """Fine-tune initialization: replace a fresh TrainState's (params,
    rest) with a committed snapshot's leaves. EMA (when tracked) is seeded
    from the loaded params; optimizer moments, step counter, and rng stay
    fresh — a fine-tune restarts the schedule (VERDICT r4 directive #1:
    fine-tune the crowding-matched hero from the committed snapshot)."""
    tree = {"params": state.params, "rest": state.rest}
    tmpl_leaves, treedef = jax.tree.flatten(tree)
    tree = jax.tree.unflatten(treedef, _load_leaves(path, tmpl_leaves))
    ema = (None if state.ema_params is None
           else jax.tree.map(np.copy, tree["params"]))
    return dataclasses.replace(state, params=tree["params"],
                               rest=tree["rest"], ema_params=ema)
