"""Multi-host input pipeline: 2-process CPU jax.distributed run.

Each process owns half the global batch; DiffusionTrainer.prepare_batch must
assemble global arrays via make_array_from_process_local_data (no process
may device_put a global batch it doesn't hold — VERDICT r1 item 8). The
child processes build a tiny trainer, run prepare_batch + one train step on
a 4-device global mesh (2 local devices each), and print the loss.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.distributed.initialize(sys.argv[1], num_processes=2,
                           process_id=int(sys.argv[2]))
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, sys.argv[3])
sys.path.insert(0, sys.argv[3] + "/tests")
from test_diffusion_trainer import tiny_models
from layoutllm_t2i_tpu.data.synthetic import synthetic_layout_batches
from layoutllm_t2i_tpu.training.diffusion_trainer import (
    DiffusionTrainer, TrainerConfig)

assert jax.device_count() == 4 and jax.local_device_count() == 2

cfg = TrainerConfig(output_root=sys.argv[4], name=f"mh", batch_size=4,
                    total_iters=1, save_every_iters=10, log_every=1,
                    warmup_steps=1, max_boxes=30, max_relations=5,
                    num_devices=4)
# per-process LOCAL batch: global 4 = 2 local x 2 processes
data = synthetic_layout_batches(2, image_size=16, max_boxes=30,
                                seed=100 + int(sys.argv[2]))
tr = DiffusionTrainer(cfg, data, models=tiny_models())
rng = jax.random.PRNGKey(0)
r_enc, r_step = jax.random.split(rng)
batch = tr.prepare_batch(next(iter(data)), r_enc)
assert batch["z"].shape[0] == 4, batch["z"].shape  # global leading dim
state, loss = tr._train_step(tr.state, tr.frozen_params, batch, r_step)
print("MHLOSS", float(loss))
"""


@pytest.mark.slow
def test_two_process_prepare_batch(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coord, str(pid), repo,
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        loss_lines = [l for l in out.splitlines() if l.startswith("MHLOSS")]
        assert loss_lines, out
        assert np.isfinite(float(loss_lines[0].split()[1]))
