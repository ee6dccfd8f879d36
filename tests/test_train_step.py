"""Train step: trainable-mode masking, loss finiteness, DP-mesh execution."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params
from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule
from layoutllm_t2i_tpu.training.train_step import (
    TRAINABLE_MODES, TrainStepConfig, init_train_state, make_train_step,
    trainable_mask,
)


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2, 1), channel_mult=(1, 2),
                     num_heads=2, context_dim=16, grounding_in_dim=16,
                     grounding_out_dim=16)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    schedule = make_ddpm_schedule("linear", 1000, 0.00085, 0.012)
    tcfg = TrainStepConfig(unet_cfg=cfg, schedule=schedule, trainable_mode="rela_fuse",
                           learning_rate=1e-2, warmup_steps=0, total_steps=100,
                           grounding_drop_prob=0.0)
    return cfg, params, schedule, tcfg


def _batch(cfg, b=2):
    g = np.random.default_rng(0)
    return {
        "z": jnp.asarray(g.standard_normal((b, cfg.image_size, cfg.image_size, 4), ).astype(np.float32)),
        "context": jnp.asarray(g.standard_normal((b, 7, cfg.context_dim)).astype(np.float32)),
        "boxes": jnp.tile(jnp.asarray([[0.1, 0.1, 0.8, 0.8]], jnp.float32), (b, 5, 1)).reshape(b, 5, 4),
        "masks": jnp.ones((b, 5), jnp.float32),
        "phrase_embeddings": jnp.asarray(g.standard_normal((b, 5, cfg.grounding_in_dim)).astype(np.float32)),
        "relations": jnp.asarray(g.standard_normal((b, 3, cfg.context_dim)).astype(np.float32)),
    }


def test_trainable_mask_selects_rela_fuse_only(setup):
    _, params, _, _ = setup
    mask = trainable_mask(params, TRAINABLE_MODES["rela_fuse"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    true_paths = [jax.tree_util.keystr(p) for p, v in leaves if v]
    assert true_paths, "no trainable params found"
    assert all("rela_fuse" in p for p in true_paths)
    # gligen mode trains fuser + position_net instead
    mask2 = trainable_mask(params, TRAINABLE_MODES["gligen"])
    paths2 = [jax.tree_util.keystr(p) for p, v in jax.tree_util.tree_leaves_with_path(mask2) if v]
    assert any("position_net" in p for p in paths2)
    assert all(("fuser" in p) or ("position_net" in p) for p in paths2)


def test_train_step_updates_only_rela_fuse(setup):
    cfg, params, schedule, tcfg = setup
    state = init_train_state(tcfg, params)
    step = jax.jit(make_train_step(tcfg, params))
    new_state, loss = step(state, _batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    def diffs(a, b):
        return jax.tree_util.tree_map_with_path(
            lambda p, x, y: (jax.tree_util.keystr(p), bool(np.any(np.asarray(x) != np.asarray(y)))),
            a, b)

    changed = [name for name, ch in jax.tree.leaves(
        diffs(params, new_state.params), is_leaf=lambda x: isinstance(x, tuple)) if ch]
    assert changed, "nothing trained"
    assert all("rela_fuse" in name for name in changed), changed[:5]


def test_train_step_on_data_mesh(setup):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from layoutllm_t2i_tpu.parallel.mesh import make_mesh

    cfg, params, schedule, tcfg = setup
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state = init_train_state(tcfg, params)
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    batch = jax.tree.map(lambda x: jax.device_put(x, data), _batch(cfg, b=8))
    step = jax.jit(make_train_step(tcfg, params),
                   in_shardings=(repl, data, repl), out_shardings=(repl, repl))
    new_state, loss = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1


def test_train_step_with_condition_map_channels():
    """Training smoke with additional_in_channels>0: a condition-map
    downsampler output concatenates to the UNet input (openaimodel.py:433-435)
    and the step still optimizes (VERDICT r1 item 6)."""
    from layoutllm_t2i_tpu.models.grounding_extras import (
        grounding_downsampler, init_grounding_downsampler)

    cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2, 1), channel_mult=(1, 2),
                     num_heads=2, context_dim=16, grounding_in_dim=16,
                     grounding_out_dim=16, additional_in_channels=8)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    schedule = make_ddpm_schedule("linear", 1000, 0.00085, 0.012)
    tcfg = TrainStepConfig(unet_cfg=cfg, schedule=schedule,
                           trainable_mode="gligen", learning_rate=1e-2,
                           warmup_steps=0, total_steps=10,
                           grounding_drop_prob=0.0)
    state = init_train_state(tcfg, params)
    step = jax.jit(make_train_step(tcfg, params))

    batch = _batch(cfg)
    # synthetic condition map -> downsampler -> (B, 8, 8, 8) extra channels
    dparams = init_grounding_downsampler(jax.random.PRNGKey(1), 8)
    cmap = jnp.ones((2, 32, 32, 1), jnp.float32) * 0.5
    batch["grounding_extra"] = grounding_downsampler(dparams, cmap,
                                                     resize_input=32)
    assert batch["grounding_extra"].shape == (2, 8, 8, 8)
    state, loss = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_mixed_precision_train_step(setup):
    """bf16 compute with f32 master weights: grads land in f32, loss finite,
    params actually move (opt-in — the reference trains fp32)."""
    import dataclasses

    cfg, params, schedule, tcfg = setup
    mp_cfg = dataclasses.replace(tcfg, mixed_precision=True)
    state = init_train_state(mp_cfg, params)
    step = jax.jit(make_train_step(mp_cfg, params))
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, loss = step(state, _batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)  # master weights f32
    # rela_fuse leaves moved
    moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(state.params),
                                jax.tree_util.tree_leaves(params)))
    assert moved


def test_grad_accumulation_matches_manual_average(setup):
    """accum_steps=k: one jitted step scans k microbatches and applies ONE
    update from the averaged grads — verified against a hand-rolled
    two-microbatch average through the same optimizer."""
    import dataclasses

    import optax

    from layoutllm_t2i_tpu.training.train_step import (
        combine_params, init_partitioned_state, make_loss_fn,
        make_partitioned_optimizer, make_partitioned_train_step,
    )

    cfg, params, schedule, tcfg = setup
    rng = jax.random.PRNGKey(3)
    batch = _batch(cfg, b=4)

    acfg = dataclasses.replace(tcfg, accum_steps=2)
    state, frozen = init_partitioned_state(acfg, params)
    step = jax.jit(make_partitioned_train_step(acfg))
    new_state, loss = step(state, frozen, batch, rng)
    assert np.isfinite(float(loss))

    state2, frozen2 = init_partitioned_state(tcfg, params)
    loss_fn = make_loss_fn(tcfg)
    mbs = jax.tree.map(lambda x: x.reshape(2, 2, *x.shape[1:]), batch)
    rngs = jax.random.split(rng, 2)
    losses, grads = [], []
    for i in range(2):
        mb = jax.tree.map(lambda x: x[i], mbs)
        l, g = jax.value_and_grad(
            lambda t: loss_fn(combine_params(t, frozen2), mb, rngs[i])
        )(state2.params)
        losses.append(l)
        grads.append(g)
    avg = jax.tree.map(lambda a, b: (a + b) / 2, grads[0], grads[1])
    tx = make_partitioned_optimizer(tcfg)
    updates, _ = tx.update(avg, state2.opt_state, state2.params)
    expected = optax.apply_updates(state2.params, updates)

    np.testing.assert_allclose(
        float(loss), float((losses[0] + losses[1]) / 2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
