"""Fused Pallas GroupNorm/LayerNorm kernels vs the plain-XLA reference math.

Kernels run in interpreter mode on CPU (same code path the TPU compiles);
the backward is the custom-VJP recompute and must match XLA grads exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.ops.pallas.norms import (
    _gn_pallas, _gn_reference, _ln_pallas, _ln_reference,
    group_norm_silu, layer_norm_fused,
)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 128), 32),     # eligible: C%128==0
    ((1, 16, 16, 256), 32),
    ((2, 4, 4, 384), 32),     # C=384 -> cg=12
])
@pytest.mark.parametrize("silu", [False, True])
def test_group_norm_kernel(rng, shape, groups, silu):
    x = rng.standard_normal(shape).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, shape[-1]).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, shape[-1]).astype(np.float32)
    ref = _gn_reference(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                        groups, 1e-5, silu)
    out = _gn_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                     groups, 1e-5, silu, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_group_norm_kernel_bf16(rng):
    x = rng.standard_normal((2, 8, 8, 128)).astype(np.float32)
    gamma = np.ones(128, np.float32)
    beta = np.zeros(128, np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    ref = _gn_reference(xb, jnp.asarray(gamma), jnp.asarray(beta), 32, 1e-5, True)
    out = _gn_pallas(xb, jnp.asarray(gamma), jnp.asarray(beta), 32, 1e-5, True,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_group_norm_fallback_shapes(rng):
    # C not a lane multiple -> must silently fall back to the XLA math
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 64)).astype(np.float32))
    gamma = jnp.ones(64)
    beta = jnp.zeros(64)
    out = group_norm_silu(x, gamma, beta, 32, 1e-5, False)
    ref = _gn_reference(x, gamma, beta, 32, 1e-5, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_group_norm_grad_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 128).astype(np.float32))
    beta = jnp.asarray(rng.uniform(-0.5, 0.5, 128).astype(np.float32))

    def loss_fused(x, g, b):
        return jnp.sum(group_norm_silu(x, g, b, 32, 1e-5, True) ** 2)

    def loss_ref(x, g, b):
        return jnp.sum(_gn_reference(x, g, b, 32, 1e-5, True) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("rows,c", [(64, 128), (1024, 384), (8, 768)])
def test_layer_norm_kernel(rng, rows, c):
    x = rng.standard_normal((rows, c)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, c).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, c).astype(np.float32)
    ref = _ln_reference(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 1e-5)
    out = _ln_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 1e-5,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_layer_norm_grad_matches_xla(rng):
    x = jnp.asarray(rng.standard_normal((3, 16, 128)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 128).astype(np.float32))
    beta = jnp.zeros(128)

    g1 = jax.grad(lambda x: jnp.sum(layer_norm_fused(x, gamma, beta, 1e-5) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(_ln_reference(x, gamma, beta, 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_group_norm_group_chunked(rng):
    """Wide-channel sites split along the group axis (VMEM budget); group
    chunks must be numerically identical to the single-block kernel."""
    from layoutllm_t2i_tpu.ops.pallas.norms import _gn_group_chunks

    x = rng.standard_normal((1, 16, 16, 1920)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 1920).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, 1920).astype(np.float32)
    ref = _gn_reference(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                        32, 1e-5, True)
    for k in (2, 4, 8):
        out = _gn_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                         32, 1e-5, True, interpret=True, k=k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # Mosaic: a split channel dim must be a 128-multiple; k=1 is exempt
    assert _gn_group_chunks(1024, 1280, 32, 2) == 1      # fits whole
    assert _gn_group_chunks(256, 2560, 32, 2) == 1
    assert _gn_group_chunks(4096, 2048, 32, 2) == 8      # 256-ch chunks
    assert _gn_group_chunks(4096, 640, 32, 2) is None    # 320/160/... not %128
    # 512^2 VAE site cannot fit -> fallback
    assert _gn_group_chunks(512 * 512, 128, 32, 2) is None


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 640), 32),    # UNet output-block concat site (falls off _gn_pallas)
    ((1, 8, 8, 960), 32),      # 320+640 skip concat
    ((1, 32, 32, 128), 32),    # VAE 512^2-like shape (scaled down)
])
@pytest.mark.parametrize("silu", [False, True])
def test_group_norm_rows_streaming(rng, shape, groups, silu):
    """Two-pass rows-streaming variant for blocks too big for one VMEM tile;
    must match the XLA reference on the shapes that used to fall back."""
    from layoutllm_t2i_tpu.ops.pallas.norms import _gn_pallas_rows

    x = rng.standard_normal(shape).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, shape[-1]).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, shape[-1]).astype(np.float32)
    ref = _gn_reference(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                        groups, 1e-5, silu)
    hw = shape[1] * shape[2]
    out = _gn_pallas_rows(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                          groups, 1e-5, silu, interpret=True, rb=hw // 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gn_rows_block_selection():
    from layoutllm_t2i_tpu.ops.pallas.norms import _gn_rows_block

    # 512^2 x 128: lane-padded C=128 -> rb = 8192 rows (2MB budget), divides hw
    assert _gn_rows_block(512 * 512, 128, 2) == 8192
    # (8,4096,640): C pads to 768 -> rb = 1024 (<= 1365 rounded to divide 4096)
    rb = _gn_rows_block(4096, 640, 2)
    assert rb is not None and 4096 % rb == 0 and rb % 8 == 0
    rb = _gn_rows_block(4096, 960, 2)
    assert rb is not None and 4096 % rb == 0


def test_fuser_scale_keeps_bf16():
    """A traced f32 fuser_scale must not promote activations to f32
    (round-1 silently ran most of the UNet in f32 through this)."""
    import jax

    from layoutllm_t2i_tpu.models.blocks import (
        gated_self_attention, init_gated_self_attention)

    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     init_gated_self_attention(jax.random.PRNGKey(0), 32, 24, 2, 16))
    x = jnp.ones((1, 16, 32), jnp.bfloat16)
    objs = jnp.ones((1, 4, 24), jnp.bfloat16)

    def f(scale):
        return gated_self_attention(p, x, objs, 2, scale)

    out = jax.eval_shape(f, jnp.float32(0.5))
    assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize("rows,c", [(64, 320), (512, 40), (96, 960)])
def test_layer_norm_non_lane_multiple_channels(rng, rows, c):
    """C that is not a 128-multiple must run the kernel (full-dim blocks are
    exempt from the lane rule) and match the reference."""
    x = rng.standard_normal((rows, c)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, c).astype(np.float32)
    beta = rng.uniform(-0.5, 0.5, c).astype(np.float32)
    ref = _ln_reference(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 1e-5)
    out = _ln_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), 1e-5,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
