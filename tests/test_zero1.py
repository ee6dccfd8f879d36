"""ZeRO-1 sharded optimizer state over the data mesh (parallel/mesh.py
zero1_sharding).

No reference counterpart: GLIGEN's only parallelism is DDP with fully
replicated Adam state (GLIGEN/main.py:59-65). Here the shardings alone make
GSPMD reduce-scatter the gradient into a sharded Adam update and all-gather
the weight delta — no collective code.
"""
import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from layoutllm_t2i_tpu.data.synthetic import synthetic_layout_batches
from layoutllm_t2i_tpu.parallel.mesh import make_mesh, zero1_sharding
from layoutllm_t2i_tpu.training.diffusion_trainer import DiffusionTrainer, TrainerConfig

from test_diffusion_trainer import tiny_models


def test_zero1_sharding_picks_largest_divisible_dim():
    mesh = make_mesh(8)
    tree = {
        "w": jax.ShapeDtypeStruct((16, 64, 3), np.float32),   # shard dim 1
        "b": jax.ShapeDtypeStruct((7,), np.float32),          # indivisible
        "s": jax.ShapeDtypeStruct((), np.float32),            # scalar
        "t": jax.ShapeDtypeStruct((8, 8), np.float32),        # tie -> first max
    }
    sh = zero1_sharding(mesh, tree)
    assert sh["w"].spec == P(None, "data", None)
    assert sh["b"].spec == P()
    assert sh["s"].spec == P()
    assert sh["t"].spec == P("data", None)


def _run_trainer(tmp_path, name, zero1):
    cfg = TrainerConfig(output_root=str(tmp_path), name=name, batch_size=8,
                        total_iters=3, save_every_iters=100, log_every=1,
                        warmup_steps=1, max_boxes=30, max_relations=5,
                        trainable_mode="all", zero1_opt_state=zero1,
                        seed=7)
    data = synthetic_layout_batches(cfg.batch_size, image_size=16, max_boxes=30)
    tr = DiffusionTrainer(cfg, data, models=tiny_models())
    tr.train()
    return tr


def test_zero1_trainer_matches_replicated_and_shards_moments(tmp_path):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    tr_ref = _run_trainer(tmp_path, "repl", zero1=False)
    tr_z1 = _run_trainer(tmp_path, "zero1", zero1=True)

    # the Adam moments actually shard: at least one leaf is not replicated
    # and its per-device shard is 1/8 of the global array
    sharded = [
        leaf for leaf in jax.tree.leaves(tr_z1.state.opt_state)
        if hasattr(leaf, "sharding") and leaf.ndim >= 1
        and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, "no optimizer-state leaf was sharded"
    shard = sharded[0].addressable_shards[0].data
    assert shard.size == sharded[0].size // 8

    # same math as the replicated baseline (f32 end to end; the only change
    # is where the Adam state lives)
    for a, b in zip(jax.tree.leaves(tr_ref.state.params),
                    jax.tree.leaves(tr_z1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_zero1_composes_with_grad_accumulation(tmp_path):
    """zero1 (sharded Adam state) and accum_steps (scanned microbatches) are
    orthogonal and must compose in one jitted step."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = TrainerConfig(output_root=str(tmp_path), name="z1acc", batch_size=16,
                        total_iters=2, save_every_iters=100, log_every=1,
                        warmup_steps=1, max_boxes=30, max_relations=5,
                        trainable_mode="all", zero1_opt_state=True,
                        accum_steps=2, seed=7)
    data = synthetic_layout_batches(cfg.batch_size, image_size=16, max_boxes=30)
    tr = DiffusionTrainer(cfg, data, models=tiny_models())
    tr.train()
    assert int(tr.state.step) == 2
    sharded = [l for l in jax.tree.leaves(tr.state.opt_state)
               if hasattr(l, "sharding") and l.ndim >= 1
               and not l.sharding.is_fully_replicated]
    assert sharded
