"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4(d): distributed paths are validated with
``--xla_force_host_platform_device_count=8`` instead of real chips.
"""
import os

# neutralize the axon TPU tunnel (its sitecustomize force-registers the
# remote backend regardless of JAX_PLATFORMS)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch float32; force full-precision matmuls
# (production keeps the backend default: bf16 MXU passes on TPU).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Smoke tier (VERDICT r4 weak #6): `pytest -m fast` runs the host-side and
# small-JAX modules — ~100 s total on this 1-core box (measured with
# --durations=0, round 5) vs ~50 min for the full suite. Modules stay
# unmarked in source; membership is by measured cost, maintained here.
FAST_MODULES = {
    "test_attention.py", "test_caption_metrics.py", "test_checkpoint_io.py",
    "test_clip_vision.py", "test_convert.py", "test_data.py",
    "test_dtype_policy.py", "test_fid.py", "test_flops.py",
    "test_grounding_extras.py", "test_metrics.py", "test_modalities.py",
    "test_planner.py", "test_relation.py", "test_resnet.py",
    "test_reward.py", "test_rl_fixture.py", "test_scene_graph_stats.py",
    "test_schedules.py",
    "test_tokenizer.py", "test_unet.py", "test_vae.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (os.path.basename(str(item.fspath)) in FAST_MODULES
                and "slow" not in item.keywords):
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
