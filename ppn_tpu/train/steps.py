"""Jitted train/eval steps — the hot loop of ref:train.py† (SURVEY.md §3.1),
rebuilt as pure SPMD functions.

Differences from the reference's loop, by design:
* Target-grid encoding runs **inside** the jitted step on device (the
  reference does it in DataLoader workers on CPU; BASELINE mandates fused
  on-device preprocessing).
* The model is split into (graphdef, params, rest) via flax.nnx so the step
  is a pure function: params get gradients, `rest` carries BatchNorm running
  stats forward.
* Under a `data`-axis mesh the same jitted function is the multi-chip
  data-parallel step — XLA inserts the gradient all-reduce (SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from ppn_tpu.configs.base import Config
from ppn_tpu.nn.model import PoseProposalNet
from ppn_tpu.ops import encode as enc
from ppn_tpu.train.loss import ppn_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Pytree train state (params/batch-stats/optimizer/step)."""

    params: Any
    rest: Any          # BatchNorm running stats + any other non-diff state
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray   # PRNG key driving on-device augmentation
    # EMA of params when cfg.train.ema_decay > 0, else None (None leaves
    # vanish from the pytree, so disabled-EMA checkpoints keep the old
    # structure).
    ema_params: Any = None


def eval_params(state: TrainState):
    """The params eval/inference should use: EMA copy when tracked."""
    return state.params if state.ema_params is None else state.ema_params


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    t = cfg.train
    if t.lr_schedule == "constant":
        sched = optax.constant_schedule(t.learning_rate)
    elif t.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=t.learning_rate,
            warmup_steps=t.warmup_steps,
            decay_steps=max(t.num_steps, t.warmup_steps + 1))
    elif t.lr_schedule == "step":
        # boundaries are offset by warmup below (join_schedules passes
        # step − warmup to the second schedule), so subtract it here to
        # keep decays at the configured absolute steps
        off = t.warmup_steps
        sched = optax.piecewise_constant_schedule(
            t.learning_rate,
            {int(t.num_steps * 0.6) - off: 0.1,
             int(t.num_steps * 0.85) - off: 0.1})
    else:
        raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")
    if t.warmup_steps and t.lr_schedule != "cosine":
        warmup = optax.linear_schedule(0.0, t.learning_rate, t.warmup_steps)
        sched = optax.join_schedules([warmup, sched], [t.warmup_steps])
    return sched


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """SGD-momentum + decoupled weight decay on matrix/conv kernels only
    (lineage defaults, ref:train.py†; SURVEY.md §2.1 Train-loop row)."""
    sched = make_lr_schedule(cfg)

    def decay_mask(params):
        return jax.tree.map(lambda p: p.ndim > 1, params)

    return optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay, mask=decay_mask),
        optax.sgd(sched, momentum=cfg.train.momentum, nesterov=False),
    )


def create_model(cfg: Config, seed: int | None = None) -> PoseProposalNet:
    seed = cfg.train.seed if seed is None else seed
    dtype = jnp.bfloat16 if cfg.train.dtype == "bfloat16" else jnp.float32
    model = PoseProposalNet(cfg.model, dtype=dtype, rngs=nnx.Rngs(seed))
    model.train()
    return model


def create_train_state(
    cfg: Config, seed: int | None = None, pretrained: str | None = None
) -> Tuple[nnx.GraphDef, TrainState, optax.GradientTransformation]:
    """Fresh train state; ``pretrained`` points at a torchvision-format
    ResNet ``.pth`` used to initialize the backbone (SURVEY.md §5
    checkpoint row — the reference starts from ImageNet resnet18)."""
    model = create_model(cfg, seed)
    if pretrained:
        from ppn_tpu.utils.torch_import import load_torch_resnet_file

        used = load_torch_resnet_file(model.backbone, pretrained)
        print(f"initialized backbone from {pretrained} ({used} tensors)")
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(cfg.train.seed if seed is None else seed)
    ema = (jax.tree.map(jnp.copy, params)
           if cfg.train.ema_decay > 0 else None)
    return graphdef, TrainState(params=params, rest=rest,
                                opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32),
                                rng=rng, ema_params=ema), tx


def make_train_step(
    cfg: Config,
    graphdef: nnx.GraphDef,
    tx: optax.GradientTransformation,
    augment: bool = False,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted SPMD train step.

    `batch` keys: image (B,H,W,3) f32 in [0,1], keypoints (B,P,K,2),
    visible (B,P,K), bboxes (B,P,4), valid (B,P) — all shardable on dim 0.
    With ``augment=True`` the fused on-device affine/flip/color augmentation
    (ops/augment.py) runs inside this step before target encoding.
    """
    body = partial(_train_step_body, cfg, graphdef, tx, augment)
    return jax.jit(body, donate_argnums=(0,))


def _train_step_body(cfg: Config, graphdef, tx, augment: bool,
                     state: TrainState, batch):
    """One SGD step as a pure function — shared by the per-dispatch step
    (make_train_step) and the device-resident scan loop
    (make_multi_train_step); both paths consume the identical RNG stream
    and math."""
    m = cfg.model
    rng = state.rng
    if augment:
        from ppn_tpu.ops.augment import augment_batch

        rng, sub = jax.random.split(rng)
        batch = dict(batch, **augment_batch(m, cfg.data, sub, {
            k: batch[k] for k in
            ("image", "keypoints", "visible", "bboxes", "valid")}))
    targets = enc.encode_batch(m, batch["keypoints"], batch["visible"],
                               batch["bboxes"], batch["valid"])

    def loss_fn(params):
        # Re-box the non-diff state at this trace level: BatchNorm will
        # mutate these Variables inside the grad trace, and flax forbids
        # mutating Variables created at an outer trace.
        rest = jax.tree.map(lambda x: x, state.rest)
        model = nnx.merge(graphdef, params, rest)
        fm = model(batch["image"])
        total, terms = ppn_loss(m, fm, targets)
        _, _, new_rest = nnx.split(model, nnx.Param, ...)
        return total, (terms, new_rest)

    (_, (terms, new_rest)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    d = cfg.train.ema_decay
    new_ema = (None if state.ema_params is None else jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        state.ema_params, new_params))
    new_state = TrainState(params=new_params, rest=new_rest,
                           opt_state=new_opt, step=state.step + 1,
                           rng=rng, ema_params=new_ema)
    terms = dict(terms)
    terms["grad_norm"] = optax.global_norm(grads)
    return new_state, terms


def make_multi_train_step(
    cfg: Config,
    graphdef: nnx.GraphDef,
    tx: optax.GradientTransformation,
    augment: bool = True,
    steps_per_call: int = 8,
):
    """Device-resident training: ``steps_per_call`` SGD steps per dispatch.

    The per-dispatch host→device round trip costs ~8 ms/step at B=128 on
    a tunneled rig (tools/train_split.py: 66.2 ms host loop vs 57.8 ms
    device-honest) — and even co-located hosts pay a pytree-enqueue tax.
    With the dataset already in HBM (data/device_cache.DeviceCache), the
    TPU-native loop is a ``lax.scan`` over K steps: the host sends ONE
    (K, B) int32 index block per dispatch and the chip never waits.

    Returns ``multi_step(state, cache, idx) -> (state, mean_terms)``:
      * ``cache`` — dict of device-resident collated arrays (rows =
        samples), e.g. ``DeviceCache.data``; NOT donated, reused across
        calls.
      * ``idx`` — (steps_per_call, B) int32 sample indices.
      * ``mean_terms`` — loss terms averaged over the K steps (one
        logging point per dispatch).

    Per-step math, RNG stream, and batches are IDENTICAL to
    make_train_step (shared ``_train_step_body``). Parameters agree with
    K per-step dispatches to cross-program rounding noise — the scan
    body and the standalone step compile to different XLA fusions, so
    gradients differ in their last f32 bits and the optimizer amplifies
    that (~1e-4 max param diff after 4 steps; characterized in
    tests/test_multi_step.py, bitwise at K=1).
    """
    body = partial(_train_step_body, cfg, graphdef, tx, augment)
    keys = ("image", "keypoints", "visible", "bboxes", "valid")

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
    def multi_step(state: TrainState, cache, idx, batch_sharding=None):
        data = {k: cache[k] for k in keys if k in cache}

        def scan_body(st, i):
            batch = jax.tree.map(lambda x: x[i], data)
            if batch_sharding is not None:
                # sharded-cache SPMD: pin the gathered batch to the data
                # axis so the scan body stays the standard sharded step
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, batch_sharding), batch)
            st, terms = body(st, batch)
            return st, terms

        state, terms = jax.lax.scan(scan_body, state, idx)
        return state, jax.tree.map(lambda t: jnp.mean(t, axis=0), terms)

    return multi_step


def make_eval_loss_step(cfg: Config, graphdef: nnx.GraphDef):
    """Loss-only eval step (running-average BN, no state mutation)."""
    m = cfg.model

    @jax.jit
    def eval_step(state: TrainState, batch):
        targets = enc.encode_batch(m, batch["keypoints"], batch["visible"],
                                   batch["bboxes"], batch["valid"])
        model = nnx.merge(graphdef, state.params, state.rest)
        model.eval()
        fm = model(batch["image"])
        _, terms = ppn_loss(m, fm, targets)
        return terms

    return eval_step


def make_forward(cfg: Config, graphdef: nnx.GraphDef, *,
                 flip_tta: bool = False):
    """Inference forward: images → float32 feature map (eval-mode BN).

    flip_tta=True also runs the mirrored image and merges both predictions
    in logit space (ops/tta.py) — one jit, one extra forward, no extra
    postprocess pass.
    """

    @jax.jit
    def forward(state: TrainState, images):
        model = nnx.merge(graphdef, eval_params(state), state.rest)
        model.eval()
        fm = model(images)
        if flip_tta:
            from ppn_tpu.ops.tta import merge_flip_tta, mirror_images
            fm = merge_flip_tta(cfg.model, fm,
                                model(mirror_images(images)))
        return fm

    return forward
