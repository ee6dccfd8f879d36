"""Multi-device paths on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import pytest

from layoutllm_t2i_tpu.parallel.mesh import make_mesh
from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
from layoutllm_t2i_tpu.pipeline.loaders import random_models


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_generation_matches_single_device():
    models = random_models(small=True)
    pipe = InferencePipeline(models, steps=4, sampler="plms", guidance_scale=7.5,
                             alpha_type=(0.3, 0.0, 0.7))
    mesh = make_mesh(8)
    prompts = [f"prompt {i}" for i in range(8)]
    layouts = [([[0.1, 0.1, 0.6, 0.6]], ["cat"])] * 8
    sharded = pipe.generate_sharded(mesh, prompts, layouts, seed=5)
    single = pipe.generate(prompts, layouts, seed=5)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
