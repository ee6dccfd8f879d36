"""Async checkpoint writer (checkpoint/async_io.py): snapshot semantics,
error surfacing, and trainer integration.

The reference trainer writes synchronously every save
(trainer_combined_layout.py:523-535); the async path must produce the same
bytes on disk while the loop keeps training."""
import os
import pickle
import threading
import time

import numpy as np
import jax
import pytest

from layoutllm_t2i_tpu.checkpoint.async_io import AsyncWriter
from layoutllm_t2i_tpu.checkpoint.io import load_checkpoint
from layoutllm_t2i_tpu.data.synthetic import synthetic_layout_batches
from layoutllm_t2i_tpu.training.diffusion_trainer import DiffusionTrainer, TrainerConfig

from test_diffusion_trainer import tiny_models


def test_writer_runs_and_single_slot():
    w = AsyncWriter()
    order = []
    gate = threading.Event()

    def slow():
        gate.wait(timeout=10)
        order.append("slow")

    w.submit(slow)
    assert w.busy
    # second submit must join the first before starting (single slot)
    t = threading.Thread(target=lambda: w.submit(lambda: order.append("fast")))
    t.start()
    time.sleep(0.05)
    assert order == []  # second write blocked behind the gate
    gate.set()
    t.join(timeout=10)
    w.wait()
    assert order == ["slow", "fast"]


def test_writer_surfaces_background_error_on_wait_and_next_submit():
    w = AsyncWriter()
    w.submit(lambda: (_ for _ in ()).throw(IOError("disk full")))
    with pytest.raises(IOError, match="disk full"):
        w.wait()
    # error is consumed; the writer is reusable
    w.submit(lambda: None)
    w.wait()

    w.submit(lambda: (_ for _ in ()).throw(IOError("disk full")))
    with pytest.raises(IOError, match="disk full"):
        # at the latest, a failed save surfaces at the NEXT save
        w.submit(lambda: None)


def test_async_save_snapshots_state_before_mutation(tmp_path):
    """save_ckpt's device->host snapshot happens on the caller: mutating the
    live state right after save_ckpt returns must not change what lands on
    disk (the donated next train step would do exactly that mutation)."""
    cfg = TrainerConfig(output_root=str(tmp_path), name="a", batch_size=2,
                        total_iters=1, save_every_iters=10, log_every=1,
                        warmup_steps=1, max_boxes=30, max_relations=5,
                        async_ckpt=True)
    data = synthetic_layout_batches(cfg.batch_size, image_size=16, max_boxes=30)
    tr = DiffusionTrainer(cfg, data, models=tiny_models())
    want = jax.tree.map(np.asarray, tr.state.params)
    tr.save_ckpt(7)
    # clobber the live params while the write may still be in flight
    tr.state = tr.state._replace(
        params=jax.tree.map(lambda x: x * 0 + 123.0, tr.state.params))
    tr.ckpt_writer.wait()
    payload, cfg_loaded = load_checkpoint(
        os.path.join(tr.run_dir, "checkpoint_00000007"))
    assert payload["iters"] == 7
    assert cfg_loaded["async_ckpt"] is True
    got_params = payload["state"][0]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 want, got_params)


def test_async_and_sync_saves_match(tmp_path):
    cfg_kw = dict(output_root=str(tmp_path), batch_size=2, total_iters=1,
                  save_every_iters=10, log_every=1, warmup_steps=1,
                  max_boxes=30, max_relations=5)
    data = synthetic_layout_batches(2, image_size=16, max_boxes=30)
    tr_a = DiffusionTrainer(TrainerConfig(name="async", async_ckpt=True,
                                          **cfg_kw), data, models=tiny_models())
    tr_s = DiffusionTrainer(TrainerConfig(name="sync", async_ckpt=False,
                                          **cfg_kw), data, models=tiny_models())
    tr_a.save_ckpt(1)
    tr_a.ckpt_writer.wait()
    tr_s.save_ckpt(1)
    pa, _ = load_checkpoint(os.path.join(tr_a.run_dir, "checkpoint_00000001"))
    ps, _ = load_checkpoint(os.path.join(tr_s.run_dir, "checkpoint_00000001"))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 pa["state"][0], ps["state"][0])
