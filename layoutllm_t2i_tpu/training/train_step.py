"""Diffusion training step (eps-MSE) with frozen/trainable masking.

Reference: GLIGEN/trainer_combined_layout.py:397-420 (run_one_step) and the
trainable-parameter selection at :248-260 (relation-aware mode trains only
``transformer_blocks*rela_fuse``; vanilla GLIGEN trains ``fuser`` +
``position_net``, trainer.py:220-242).

TPU-native shape: the whole step (timestep draw, q_sample, UNet forward,
grad, masked optimizer update) is one jitted program; with a sharded batch
and replicated params XLA inserts the gradient all-reduce over the ``data``
mesh axis — the DDP wrapper and NCCL helpers of the reference have no
equivalent code here.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.ddpm import q_sample
from ..models.unet import UNetConfig, unet_apply
from ..ops.schedules import DDPMSchedule


def rela_fuse_only(path) -> bool:
    names = [str(getattr(k, "key", k)) for k in path]
    return "transformer_blocks" in names and "rela_fuse" in names


def fuser_and_position_net(path) -> bool:
    names = [str(getattr(k, "key", k)) for k in path]
    return "fuser" in names or "position_net" in names


TRAINABLE_MODES = {
    "rela_fuse": rela_fuse_only,            # LayoutLLM-T2I relation training
    "gligen": fuser_and_position_net,       # vanilla GLIGEN grounding training
    "all": lambda path: True,
}


def trainable_mask(params, predicate: Callable) -> Any:
    return jax.tree_util.tree_map_with_path(lambda path, _: bool(predicate(path)), params)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None  # populated when TrainStepConfig.ema_rate is set


@dataclasses.dataclass
class TrainStepConfig:
    unet_cfg: UNetConfig
    schedule: DDPMSchedule
    trainable_mode: str = "rela_fuse"
    learning_rate: float = 5e-5
    weight_decay: float = 0.0
    warmup_steps: int = 10000
    total_steps: int = 500_000
    lr_schedule: str = "constant"  # constant | cosine, both with warmup
    grounding_drop_prob: float = 0.1  # CFG drop (openaimodel.py:421-422)
    # EMA of params (reference LitEma / trainer update_ema; disabled there by
    # default and here when None)
    ema_rate: Optional[float] = None
    # rematerialize the UNet forward in backward (jax.checkpoint): trades
    # ~30% step FLOPs for activation memory — required for 512^2 batches on
    # 16GB chips (the reference's use_checkpoint flag, openaimodel.py:206-209)
    remat: bool = False
    # bf16 compute with f32 master weights: params/batch cast to bf16 inside
    # the loss (the cast transpose yields f32 grads, Adam state stays f32).
    # Off by default — the reference trains fp32.
    mixed_precision: bool = False
    # gradient accumulation: the jitted step scans over accum_steps
    # microbatches (batch reshaped (k, B/k, ...)), averages grads, applies
    # ONE optimizer/EMA update. Peak activation memory drops ~k-fold for the
    # same effective batch — the TPU-native route to reference-scale global
    # batches on few chips (the reference instead requires one GPU per
    # batch_size/num_gpus slice, GLIGEN/main.py:59-65). Requires
    # batch_size % accum_steps == 0.
    accum_steps: int = 1
    # adamw (reference, trainer_combined_layout.py:265) or sgd. sgd keeps
    # ZERO optimizer state — required for --trainable_mode all on a 16 GB
    # chip, where AdamW's f32 moments for the full 860M-param UNet
    # (~6.9 GB) blow HBM (measured RESOURCE_EXHAUSTED, round 5)
    optimizer: str = "adamw"


def _lr_schedule(cfg: TrainStepConfig):
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps
        )
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
            optax.constant_schedule(cfg.learning_rate),
        ],
        [cfg.warmup_steps],
    )


def _base_tx(cfg: TrainStepConfig):
    sched = _lr_schedule(cfg)
    if cfg.optimizer == "sgd":
        return optax.sgd(sched)
    return optax.adamw(sched, weight_decay=cfg.weight_decay)


def make_optimizer(cfg: TrainStepConfig, params):
    tx = _base_tx(cfg)
    predicate = TRAINABLE_MODES[cfg.trainable_mode]
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "train" if predicate(path) else "freeze", params
    )
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def init_train_state(cfg: TrainStepConfig, params) -> TrainState:
    tx = make_optimizer(cfg, params)
    ema = jax.tree.map(lambda x: x, params) if cfg.ema_rate is not None else None
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32), ema_params=ema)


def make_loss_fn(cfg: TrainStepConfig):
    schedule = cfg.schedule
    predicate = TRAINABLE_MODES[cfg.trainable_mode]

    def unet_fwd(params, unet_cfg, x, t, context, boxes, masks, pos,
                 relations, grounding_extra):
        # 'auto' dispatches long self-attention to the Pallas flash kernel,
        # which carries a custom VJP (recompute-softmax backward kernels,
        # ops/pallas/flash_attention.py) — the O(N^2) score matrix is never
        # stored, so remat over attention is unnecessary on the flash path
        return unet_apply(params, unet_cfg, x, t, context, boxes, masks, pos,
                          relations, grounding_extra=grounding_extra,
                          attn_impl="auto")

    if cfg.remat:
        unet_fwd = jax.checkpoint(
            unet_fwd, static_argnums=(1,),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def loss_fn(params, batch, rng):
        """batch: z (B,h,w,4) clean latents, context (B,77,768),
        boxes/masks/phrase_embeddings, relations."""
        # prune gradient computation for frozen subtrees (~20% step time)
        mask = trainable_mask(params, predicate)
        params = jax.tree.map(
            lambda leaf, tr: leaf if tr else jax.lax.stop_gradient(leaf),
            params, mask)
        b = batch["z"].shape[0]
        r_t, r_noise, r_drop = jax.random.split(rng, 3)
        # t ~ floor(U^1 * 1000), 1000 -> 999 (trainer_combined_layout.py:379-381)
        t = (jax.random.uniform(r_t, (b,)) * schedule.num_timesteps).astype(jnp.int32)
        t = jnp.where(t == schedule.num_timesteps, schedule.num_timesteps - 1, t)
        noise = jax.random.normal(r_noise, batch["z"].shape, batch["z"].dtype)
        x_noisy = q_sample(schedule, batch["z"], t, noise)

        if cfg.mixed_precision:
            bf16 = lambda tree: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)
            params = bf16(params)
            x_noisy = x_noisy.astype(jnp.bfloat16)
            batch = dict(batch, context=batch["context"].astype(jnp.bfloat16),
                         phrase_embeddings=batch["phrase_embeddings"].astype(jnp.bfloat16),
                         relations=batch["relations"].astype(jnp.bfloat16))

        # 10% grounding drop for guidance training: zero the grounding inputs
        # (the null input is all-zeros, text_layout_tokinzer_input.py:47-62)
        keep = (jax.random.uniform(r_drop, ()) >= cfg.grounding_drop_prob).astype(
            batch["masks"].dtype
        )
        boxes = batch["boxes"] * keep
        masks = batch["masks"] * keep
        pos = batch["phrase_embeddings"] * keep

        # extra input channels from a condition-map downsampler ride through
        # the grounding drop untouched (openaimodel.py:433-435 applies the
        # downsampler unconditionally; only tokenizer input is dropped)
        eps = unet_fwd(params, cfg.unet_cfg, x_noisy, t, batch["context"],
                       boxes, masks, pos, batch["relations"],
                       batch.get("grounding_extra"))
        return jnp.mean((eps - noise) ** 2)

    return loss_fn


# ---------------------------------------------------------------------------
# partitioned train step: the frozen params stay OUT of the optimizer state.
#
# For partial finetuning (rela_fuse: ~2% of the 1.26B params) carrying the
# full tree through the donated train state is waste: the frozen subtree is
# read-only input, never returned, never donated; the state (trainable params
# + Adam moments + step) is tiny. Gradients for frozen leaves are never
# computed (differentiation runs only over the trainable subtree).


def partition_params(params, predicate: Callable):
    """(trainable, frozen) trees with None placeholders (equinox-style)."""
    mask = trainable_mask(params, predicate)
    train = jax.tree.map(lambda l, m: l if m else None, params, mask)
    frozen = jax.tree.map(lambda l, m: None if m else l, params, mask)
    return train, frozen


def combine_params(trainable, frozen):
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen,
        is_leaf=lambda x: x is None,
    )


def make_partitioned_optimizer(cfg: TrainStepConfig):
    return _base_tx(cfg)


def init_partitioned_state(cfg: TrainStepConfig, params):
    trainable, frozen = partition_params(params, TRAINABLE_MODES[cfg.trainable_mode])
    tx = make_partitioned_optimizer(cfg)
    state = TrainState(params=trainable, opt_state=tx.init(trainable),
                       step=jnp.zeros((), jnp.int32),
                       ema_params=(jax.tree.map(lambda x: x, trainable)
                                   if cfg.ema_rate is not None else None))
    return state, frozen


def make_partitioned_train_step(cfg: TrainStepConfig):
    tx = make_partitioned_optimizer(cfg)
    loss_fn = make_loss_fn(cfg)

    def train_step(state: TrainState, frozen, batch, rng):
        def loss_over(trainable, mb, r):
            return loss_fn(combine_params(trainable, frozen), mb, r)

        if cfg.accum_steps > 1:
            k = cfg.accum_steps
            mbs = jax.tree.map(
                lambda x: x.reshape(k, x.shape[0] // k, *x.shape[1:]), batch)
            rngs = jax.random.split(rng, k)

            def micro(carry, xs):
                g_sum, l_sum = carry
                mb, r = xs
                l, g = jax.value_and_grad(loss_over)(state.params, mb, r)
                return (jax.tree.map(jnp.add, g_sum, g), l_sum + l), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, l_sum), _ = jax.lax.scan(micro, (zero, jnp.zeros(())),
                                             (mbs, rngs))
            grads = jax.tree.map(lambda g: g / k, g_sum)
            loss = l_sum / k
        else:
            loss, grads = jax.value_and_grad(loss_over)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if cfg.ema_rate is not None:
            r = cfg.ema_rate
            ema = jax.tree.map(lambda e, p: e * r + p * (1 - r), ema, params)
        return TrainState(params, opt_state, state.step + 1, ema), loss

    return train_step


def make_train_step(cfg: TrainStepConfig, params_template):
    if cfg.accum_steps > 1:
        raise NotImplementedError(
            "gradient accumulation lives on the partitioned step "
            "(make_partitioned_train_step) — the trainer's path")
    tx = make_optimizer(cfg, params_template)
    loss_fn = make_loss_fn(cfg)

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if cfg.ema_rate is not None:
            r = cfg.ema_rate
            ema = jax.tree.map(lambda e, p: e * r + p * (1 - r), ema, params)
        return TrainState(params, opt_state, state.step + 1, ema), loss

    return train_step
