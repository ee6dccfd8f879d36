"""The --fast preset has ONE definition (pipeline/presets.py) and every
surface that exposes the flag resolves to it (reference behavior: the
serving knobs `txt2img.py` exposes per-flag are bundled here as the
measured production preset, PERF.md rounds 4-5)."""
import argparse

import pytest

from layoutllm_t2i_tpu.pipeline import presets

pytestmark = pytest.mark.fast


def _ns(**kw):
    base = dict(sampler="plms", steps=None, cfg_interval=None,
                cache_encoder=0)
    base.update(kw)
    return argparse.Namespace(**base)


def test_apply_fast_preset_defaults():
    ns = presets.apply_fast_preset(_ns())
    assert ns.sampler == presets.FAST_SAMPLER
    assert ns.steps == presets.FAST_STEPS
    assert ns.cfg_interval == presets.fast_cfg_interval_str()
    assert ns.cache_encoder == presets.FAST_CACHE_ENCODER


def test_explicit_knobs_win():
    ns = presets.apply_fast_preset(
        _ns(sampler="ddim", steps=13, cfg_interval="0.2,0.9",
            cache_encoder=3))
    assert (ns.sampler, ns.steps, ns.cfg_interval, ns.cache_encoder) == (
        "ddim", 13, "0.2,0.9", 3)


def test_serve_reexport_is_the_same_function():
    from layoutllm_t2i_tpu.cli.serve import apply_fast_preset

    assert apply_fast_preset is presets.apply_fast_preset


def test_cfg_interval_str_parses_back():
    from layoutllm_t2i_tpu.pipeline.inference import parse_cfg_interval

    assert parse_cfg_interval(presets.fast_cfg_interval_str()) == \
        presets.FAST_CFG_INTERVAL
