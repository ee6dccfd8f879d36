"""Numerical parity against the ACTUAL reference torch modules.

Unlike the rest of the suite (which checks against independent numpy
re-derivations), these tests import the reference implementation from
/root/reference/GLIGEN, random-initialize the real torch modules at reduced
size, convert their state_dicts with checkpoint/convert.py, and assert our
JAX apply functions reproduce the torch outputs:

  * PositionNet forward                 (text_grounding_net.py:6-43)
  * GatedSelfAttentionDense / -Dense2 / GatedCrossAttentionDense
                                        (attention.py:181-281)
  * RelationCrossAttention incl. padded + degenerate boxes
                                        (attention.py:284-359)
  * BasicTransformerBlock + SpatialTransformer (attention.py:362-446)
  * full relation-aware UNet forward    (openaimodel.py:234-459)
  * AutoencoderKL encode(mode)/decode   (autoencoder.py:17-44, model.py)
  * complete PLMS-50 trajectory with CFG 7.5, the [0.3,0,0.7] alpha
    schedule and the first-conv restore at alpha==0 (plms.py:58-163)
  * DDIM-50 trajectory at guidance 1    (ddim.py:65-135)

The reference is treated as an opaque oracle: we run its code, not copy it.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/GLIGEN"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from layoutllm_t2i_tpu.checkpoint.convert import nest_state_dict  # noqa: E402
from layoutllm_t2i_tpu.models import blocks as jblocks  # noqa: E402
from layoutllm_t2i_tpu.models.position_net import position_net  # noqa: E402

torch.manual_seed(0)


def t2j(module, strip=""):
    return jax.tree.map(jnp.asarray, nest_state_dict(module.state_dict(), strip))


def nchw(x):
    return jnp.asarray(np.asarray(x).transpose(0, 3, 1, 2))


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# module-level parity


def test_position_net_forward(rng):
    from ldm.modules.diffusionmodules.text_grounding_net import PositionNet

    ref = PositionNet(in_dim=48, out_dim=40).eval()
    boxes = np.abs(_rand(rng, 2, 6, 4)) % 1.0
    masks = np.array([[1, 1, 1, 0, 0, 0], [1, 0, 0, 0, 0, 0]], np.float32)
    emb = _rand(rng, 2, 6, 48)
    with torch.no_grad():
        out_ref = ref(torch.tensor(boxes), torch.tensor(masks), torch.tensor(emb)).numpy()
    ours = position_net(t2j(ref), jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=1e-5)


@pytest.mark.parametrize("fuser_type", ["gatedSA", "gatedSA2", "gatedCA"])
def test_gated_fuser_forward(rng, fuser_type):
    from ldm.modules.attention import (
        GatedCrossAttentionDense,
        GatedSelfAttentionDense,
        GatedSelfAttentionDense2,
    )

    q_dim, ctx_dim, heads, d_head = 32, 24, 2, 16
    cls = {"gatedSA": GatedSelfAttentionDense,
           "gatedSA2": GatedSelfAttentionDense2,
           "gatedCA": GatedCrossAttentionDense}[fuser_type]
    if fuser_type == "gatedCA":
        ref = cls(q_dim, ctx_dim, ctx_dim, heads, d_head).eval()
    else:
        ref = cls(q_dim, ctx_dim, heads, d_head).eval()
    # non-trivial gates: freshly-initialized alphas are 0 => identity map
    with torch.no_grad():
        ref.alpha_attn.fill_(0.7)
        ref.alpha_dense.fill_(-0.3)
    ref.scale = 0.6

    n_vis = 16 if fuser_type != "gatedSA2" else 16   # 4x4 grid
    n_obj = 4                                        # 2x2 grid (gatedSA2 resize)
    x = _rand(rng, 2, n_vis, q_dim)
    objs = _rand(rng, 2, n_obj, ctx_dim)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(objs)).numpy()

    fn = {"gatedSA": jblocks.gated_self_attention,
          "gatedSA2": jblocks.gated_self_attention2,
          "gatedCA": jblocks.gated_cross_attention}[fuser_type]
    ours = fn(t2j(ref), jnp.asarray(x), jnp.asarray(objs), heads, 0.6)
    # gatedSA2 resizes the visual grid with bicubic interpolation; torch's
    # and jax.image's bicubic kernels differ slightly (a=-0.75 vs -0.5
    # convention), giving per-element deltas up to ~2.5e-3 on unit-scale
    # activations (observed max 2.1e-3 across seeds) — a kernel-variant
    # difference, not a wiring bug; every other fuser matches at 1e-5
    tol = 3e-3 if fuser_type == "gatedSA2" else 1e-5
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=tol)


def test_relation_cross_attention_forward(rng):
    from ldm.modules.attention import RelationCrossAttention

    q_dim, ctx_dim, heads, d_head = 32, 24, 2, 16
    h = w = 8
    ref = RelationCrossAttention(q_dim, ctx_dim, ctx_dim, heads, d_head).eval()
    with torch.no_grad():
        ref.alpha_attn.fill_(0.5)
        ref.alpha_dense.fill_(0.25)

    x = _rand(rng, 3, h * w, q_dim)
    rel = _rand(rng, 3, 4, ctx_dim)
    boxes = np.zeros((3, 5, 4), np.float32)
    masks = np.zeros((3, 5), np.float32)
    # sample 0: two ordinary boxes
    boxes[0, 0] = [0.1, 0.1, 0.6, 0.5]
    boxes[0, 1] = [0.4, 0.3, 0.9, 0.95]
    masks[0, :2] = 1
    # sample 1: valid box, then a DEGENERATE one (trunc-int collapses it),
    # then another valid box that the reference's `break` skips
    boxes[1, 0] = [0.0, 0.0, 0.5, 0.5]
    boxes[1, 1] = [0.62, 0.3, 0.68, 0.8]   # int(0.62*8)==int(0.68*8)==4
    boxes[1, 2] = [0.1, 0.1, 0.9, 0.9]
    masks[1, :3] = 1
    # sample 2: no boxes at all
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(rel), torch.tensor(boxes),
                      torch.tensor(masks), h=h, w=w).numpy()

    ours = jblocks.relation_cross_attention(
        t2j(ref), jnp.asarray(x), jnp.asarray(rel), jnp.asarray(boxes),
        jnp.asarray(masks), h, w, heads)
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=1e-5)


def test_basic_transformer_block_forward(rng):
    from ldm.modules.attention import BasicTransformerBlock

    q_dim, ctx_dim, heads, d_head = 32, 24, 2, 16
    h = w = 4
    ref = BasicTransformerBlock(q_dim, ctx_dim, ctx_dim, heads, d_head,
                                fuser_type="gatedSA").eval()
    with torch.no_grad():
        ref.fuser.alpha_attn.fill_(0.4)
        ref.fuser.alpha_dense.fill_(0.2)
        ref.rela_fuse.alpha_attn.fill_(0.3)
        ref.rela_fuse.alpha_dense.fill_(0.1)
    ref.fuser.scale = 0.8  # rela_fuse.scale stays 1 (txt2img.py:46-50)

    x = _rand(rng, 2, h * w, q_dim)
    ctx = _rand(rng, 2, 7, ctx_dim)
    objs = _rand(rng, 2, 5, ctx_dim)
    rel = _rand(rng, 2, 3, ctx_dim)
    boxes = np.zeros((2, 5, 4), np.float32)
    boxes[0, 0] = [0.0, 0.0, 0.75, 0.75]
    boxes[1, 0] = [0.25, 0.25, 1.0, 1.0]
    boxes[1, 1] = [0.0, 0.5, 0.5, 1.0]
    masks = np.zeros((2, 5), np.float32)
    masks[0, :1] = 1
    masks[1, :2] = 1
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(ctx), torch.tensor(objs),
                      torch.tensor(rel), torch.tensor(boxes), torch.tensor(masks),
                      h=h, w=w).numpy()

    ours = jblocks.basic_transformer_block(
        t2j(ref), jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(objs),
        jnp.asarray(rel), jnp.asarray(boxes), jnp.asarray(masks),
        h, w, heads, fuser_scale=0.8, fuser_type="gatedSA")
    np.testing.assert_allclose(np.asarray(ours), out_ref, atol=1e-5)


def test_spatial_transformer_forward(rng):
    from ldm.modules.attention import SpatialTransformer

    c, ctx_dim, heads, d_head = 32, 24, 2, 16
    h = w = 4
    ref = SpatialTransformer(c, ctx_dim, ctx_dim, heads, d_head, depth=1,
                             fuser_type="gatedSA").eval()
    blk = ref.transformer_blocks[0]
    with torch.no_grad():
        blk.fuser.alpha_attn.fill_(0.4)
        blk.rela_fuse.alpha_attn.fill_(0.3)

    x = _rand(rng, 2, h, w, c)  # ours NHWC
    ctx = _rand(rng, 2, 7, ctx_dim)
    objs = _rand(rng, 2, 5, ctx_dim)
    rel = _rand(rng, 2, 3, ctx_dim)
    boxes = np.zeros((2, 5, 4), np.float32)
    boxes[:, 0] = [0.0, 0.0, 1.0, 1.0]
    masks = np.zeros((2, 5), np.float32)
    masks[:, 0] = 1
    with torch.no_grad():
        out_ref = ref(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(ctx),
                      torch.tensor(objs), torch.tensor(rel), torch.tensor(boxes),
                      torch.tensor(masks)).numpy()

    ours = jblocks.spatial_transformer(
        t2j(ref), jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(objs),
        jnp.asarray(rel), jnp.asarray(boxes), jnp.asarray(masks), heads,
        fuser_scale=1.0, fuser_type="gatedSA")
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), out_ref,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# reduced-size full stacks


def _ref_unet(ctx_dim=96, mc=64):
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    return UNetModel(
        image_size=8, in_channels=4, model_channels=mc, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=4, transformer_depth=1, context_dim=ctx_dim,
        fuser_type="gatedSA",
        grounding_tokenizer={
            "target": "ldm.modules.diffusionmodules.text_grounding_net.PositionNet",
            "params": {"in_dim": ctx_dim, "out_dim": ctx_dim},
        },
    ).eval()


def _our_unet_cfg(ctx_dim=96, mc=64):
    from layoutllm_t2i_tpu.models.unet import UNetConfig

    return UNetConfig(
        image_size=8, in_channels=4, model_channels=mc, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=4, transformer_depth=1, context_dim=ctx_dim,
        fuser_type="gatedSA", grounding_in_dim=ctx_dim, grounding_out_dim=ctx_dim,
    )


def _unet_inputs(rng, b=2, ctx_dim=96):
    x = _rand(rng, b, 8, 8, 4)
    t = np.array([17, 391][:b], np.int64)
    ctx = _rand(rng, b, 7, ctx_dim)
    boxes = np.zeros((b, 5, 4), np.float32)
    boxes[0, 0] = [0.0, 0.0, 0.5, 0.5]
    boxes[0, 1] = [0.25, 0.5, 1.0, 1.0]
    if b > 1:
        boxes[1, 0] = [0.1, 0.1, 0.9, 0.9]
    masks = np.zeros((b, 5), np.float32)
    masks[0, :2] = 1
    if b > 1:
        masks[1, :1] = 1
    emb = _rand(rng, b, 5, ctx_dim)
    rel = _rand(rng, b, 3, ctx_dim)
    return x, t, ctx, boxes, masks, emb, rel


def test_unet_forward_parity(rng):
    from layoutllm_t2i_tpu.models.unet import unet_apply

    ref = _ref_unet()
    cfg = _our_unet_cfg()
    x, t, ctx, boxes, masks, emb, rel = _unet_inputs(rng)
    inp = {
        "x": torch.tensor(x.transpose(0, 3, 1, 2)),
        "timesteps": torch.tensor(t),
        "context": torch.tensor(ctx),
        "grounding_input": {
            "boxes": torch.tensor(boxes),
            "masks": torch.tensor(masks),
            "positive_embeddings": torch.tensor(emb),
        },
        "relations": torch.tensor(rel),
        "inpainting_extra_input": None,
    }
    with torch.no_grad():
        out_ref = ref(inp).numpy()

    ours = unet_apply(t2j(ref), cfg, jnp.asarray(x), jnp.asarray(t.astype(np.int32)),
                      jnp.asarray(ctx), jnp.asarray(boxes), jnp.asarray(masks),
                      jnp.asarray(emb), jnp.asarray(rel), fuser_scale=1.0)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), out_ref,
                               atol=5e-5)


def test_vae_parity(rng):
    from ldm.models.autoencoder import AutoencoderKL

    from layoutllm_t2i_tpu.models.vae import VAEConfig, decode, encode

    ddconfig = dict(double_z=True, z_channels=3, resolution=32, in_channels=3,
                    out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
                    attn_resolutions=[], dropout=0.0)
    ref = AutoencoderKL(ddconfig, embed_dim=3, scale_factor=0.18215).eval()
    cfg = VAEConfig(embed_dim=3, z_channels=3, ch=32, ch_mult=(1, 2),
                    num_res_blocks=1)
    params = t2j(ref)

    img = _rand(rng, 2, 16, 16, 3)
    with torch.no_grad():
        moments = ref.quant_conv(ref.encoder(torch.tensor(img.transpose(0, 3, 1, 2))))
        mean_ref = moments[:, :3].numpy() * 0.18215   # posterior mode
    z_ours = encode(params, cfg, jnp.asarray(img), sample=False)
    np.testing.assert_allclose(np.asarray(z_ours).transpose(0, 3, 1, 2), mean_ref,
                               atol=1e-5)

    z = _rand(rng, 2, 8, 8, 3)
    with torch.no_grad():
        dec_ref = ref.decode(torch.tensor(z.transpose(0, 3, 1, 2))).numpy()
    dec_ours = decode(params, cfg, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(dec_ours).transpose(0, 3, 1, 2), dec_ref,
                               atol=2e-5)


# ---------------------------------------------------------------------------
# full sampler trajectories


def _set_alpha_scale(model, alpha):
    """Mirror of reference txt2img.py:46-50 — only the gated fusers."""
    from ldm.modules.attention import GatedCrossAttentionDense, GatedSelfAttentionDense

    for module in model.modules():
        if type(module) in (GatedCrossAttentionDense, GatedSelfAttentionDense):
            module.scale = alpha


def _run_reference_trajectory(ref, noise, ctx, uc, boxes, masks, emb, rel,
                              sd_conv_w, sd_conv_b, steps, guidance, alpha_type):
    from ldm.models.diffusion.ldm import LatentDiffusion
    from ldm.models.diffusion.plms import PLMSSampler
    from ldm.modules.attention import GatedSelfAttentionDense  # noqa: F401
    from layoutllm_t2i_tpu.ops.schedules import alpha_generator

    # make the alpha==0 first-conv restore test-controllable: swap in OUR
    # random small SD conv instead of the on-disk 320-channel one
    mc = ref.model_channels

    def fake_restore():
        conv = torch.nn.Conv2d(4, mc, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(sd_conv_w))
            conv.bias.copy_(torch.tensor(sd_conv_b))
        ref.input_blocks[0][0] = conv
        ref.first_conv_type = "SD"

    ref.restore_first_conv_from_SD = fake_restore

    from grounding_input.text_grounding_tokinzer_input import GroundingNetInput

    gti = GroundingNetInput()
    gti.prepare({"boxes": torch.tensor(boxes), "masks": torch.tensor(masks),
                 "text_embeddings": torch.tensor(emb)})
    ref.grounding_tokenizer_input = gti

    diffusion = LatentDiffusion(timesteps=1000, linear_start=0.00085,
                                linear_end=0.012)
    alpha_fn = (None if alpha_type is None
                else (lambda n: alpha_generator(n, list(alpha_type))))
    sampler = PLMSSampler(diffusion, ref, alpha_generator_func=alpha_fn,
                          set_alpha_scale=_set_alpha_scale)
    inp = {
        "x": torch.tensor(noise.transpose(0, 3, 1, 2)),
        "timesteps": None,
        "context": torch.tensor(ctx),
        "grounding_input": {
            "boxes": torch.tensor(boxes),
            "masks": torch.tensor(masks),
            "positive_embeddings": torch.tensor(emb),
        },
        "relations": torch.tensor(rel),
        "inpainting_extra_input": None,
        "grounding_extra_input": None,
    }
    with torch.no_grad():
        out = sampler.sample(S=steps, shape=noise.transpose(0, 3, 1, 2).shape,
                             input=inp, uc=torch.tensor(uc),
                             guidance_scale=guidance)
    return out.numpy()


def _run_our_trajectory(params, cfg, noise, ctx, uc, boxes, masks, emb, rel,
                        sd_conv, steps, guidance, alpha_type, sampler="plms"):
    from layoutllm_t2i_tpu.diffusion.samplers import (
        ddim_sample, make_step_tables, plms_sample)
    from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule
    from layoutllm_t2i_tpu.pipeline.inference import GligenModels, make_cfg_denoiser

    schedule = make_ddpm_schedule(timesteps=1000, linear_start=0.00085,
                                  linear_end=0.012)
    models = GligenModels(unet_cfg=cfg, unet_params=params, vae_cfg=None,
                          vae_params=None, clip_cfg=None, clip_params=None,
                          schedule=schedule, tokenizer=None,
                          sd_first_conv=sd_conv)
    tables = make_step_tables(schedule, steps, eta=0.0, alpha_type=alpha_type)
    denoise_core = make_cfg_denoiser(models, guidance)
    cond = {
        "context": jnp.asarray(ctx), "uc_context": jnp.asarray(uc),
        "boxes": jnp.asarray(boxes), "masks": jnp.asarray(masks),
        "phrase_embeddings": jnp.asarray(emb), "relations": jnp.asarray(rel),
    }

    def denoise(x, t, fscale, use_sd):
        return denoise_core(params, sd_conv, cond, x, t, fscale, use_sd)

    fn = plms_sample if sampler == "plms" else ddim_sample
    return np.asarray(fn(denoise, tables, jnp.asarray(noise)))


def test_plms_trajectory_parity(rng):
    """Full PLMS-50 with CFG 7.5, alpha [0.3,0,0.7] and first-conv restore:
    the Heun warm start, all Adams-Bashforth orders, the doubled-batch CFG,
    the scanned fuser_scale, and the SD-conv select all in one check."""
    from layoutllm_t2i_tpu.checkpoint.convert import convert_tensor

    ref = _ref_unet()
    cfg = _our_unet_cfg()
    params = t2j(ref)
    x, _t, ctx, boxes, masks, emb, rel = _unet_inputs(rng)
    uc = _rand(rng, 2, 7, 96)
    sd_conv_w = (0.05 * rng.standard_normal((64, 4, 3, 3))).astype(np.float32)
    sd_conv_b = (0.05 * rng.standard_normal((64,))).astype(np.float32)
    sd_conv = {"weight": jnp.asarray(convert_tensor("weight", torch.tensor(sd_conv_w))),
               "bias": jnp.asarray(sd_conv_b)}

    out_ref = _run_reference_trajectory(
        ref, x, ctx, uc, boxes, masks, emb, rel, sd_conv_w, sd_conv_b,
        steps=50, guidance=7.5, alpha_type=(0.3, 0.0, 0.7))
    ours = _run_our_trajectory(
        params, cfg, x, ctx, uc, boxes, masks, emb, rel, sd_conv,
        steps=50, guidance=7.5, alpha_type=(0.3, 0.0, 0.7))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), out_ref,
                               atol=1e-4, rtol=1e-4)


def test_ddim_trajectory_parity(rng):
    """DDIM-50 at guidance 1 (the reference's DDIM CFG path crashes with the
    relation UNet — ddim.py:116 omits relations; our fix is exercised by the
    PLMS CFG test above)."""
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.models.diffusion.ldm import LatentDiffusion

    from grounding_input.text_grounding_tokinzer_input import GroundingNetInput

    ref = _ref_unet()
    cfg = _our_unet_cfg()
    params = t2j(ref)
    x, _t, ctx, boxes, masks, emb, rel = _unet_inputs(rng)

    gti = GroundingNetInput()
    gti.prepare({"boxes": torch.tensor(boxes), "masks": torch.tensor(masks),
                 "text_embeddings": torch.tensor(emb)})
    ref.grounding_tokenizer_input = gti
    diffusion = LatentDiffusion(timesteps=1000, linear_start=0.00085,
                                linear_end=0.012)
    sampler = DDIMSampler(diffusion, ref)
    inp = {
        "x": torch.tensor(x.transpose(0, 3, 1, 2)),
        "timesteps": None,
        "context": torch.tensor(ctx),
        "grounding_input": {
            "boxes": torch.tensor(boxes),
            "masks": torch.tensor(masks),
            "positive_embeddings": torch.tensor(emb),
        },
        "relations": torch.tensor(rel),
        "inpainting_extra_input": None,
        "grounding_extra_input": None,
    }
    with torch.no_grad():
        out_ref = sampler.sample(S=50, shape=x.transpose(0, 3, 1, 2).shape,
                                 input=inp, uc=None, guidance_scale=1).numpy()

    uc = np.zeros_like(ctx)
    ours = _run_our_trajectory(params, cfg, x, ctx, uc, boxes, masks, emb, rel,
                               None, steps=50, guidance=1.0, alpha_type=None,
                               sampler="ddim")
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), out_ref,
                               atol=1e-4, rtol=1e-4)
