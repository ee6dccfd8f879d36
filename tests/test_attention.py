"""Attention core: XLA path vs torch einsum reference; flash kernel parity."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from layoutllm_t2i_tpu.ops.attention import multi_head_attention
from layoutllm_t2i_tpu.ops.pallas.flash_attention import flash_attention


def _torch_mha(q, k, v, heads):
    # per-head einsum attention exactly as the reference CrossAttention
    # (GLIGEN/ldm/modules/attention.py:122-143) computes it
    q, k, v = map(torch.tensor, (q, k, v))
    B, N, HC = q.shape
    M = k.shape[1]
    C = HC // heads
    scale = C ** -0.5
    qh = q.view(B, N, heads, C).permute(0, 2, 1, 3).reshape(B * heads, N, C)
    kh = k.view(B, M, heads, C).permute(0, 2, 1, 3).reshape(B * heads, M, C)
    vh = v.view(B, M, heads, C).permute(0, 2, 1, 3).reshape(B * heads, M, C)
    sim = torch.einsum("bid,bjd->bij", qh, kh) * scale
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bij,bjd->bid", attn, vh)
    return out.view(B, heads, N, C).permute(0, 2, 1, 3).reshape(B, N, HC).numpy()


def test_mha_matches_torch(rng):
    B, N, M, H, C = 2, 64, 77, 8, 40
    q = rng.standard_normal((B, N, H * C), dtype=np.float32)
    k = rng.standard_normal((B, M, H * C), dtype=np.float32)
    v = rng.standard_normal((B, M, H * C), dtype=np.float32)
    ours = np.asarray(multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H))
    ref = _torch_mha(q, k, v, H)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_mha_key_mask(rng):
    B, N, M, H, C = 1, 8, 10, 2, 16
    q = rng.standard_normal((B, N, H * C), dtype=np.float32)
    k = rng.standard_normal((B, M, H * C), dtype=np.float32)
    v = rng.standard_normal((B, M, H * C), dtype=np.float32)
    mask = np.zeros((B, M), dtype=np.float32)
    mask[:, :4] = 1
    ours = np.asarray(
        multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H,
                             mask=jnp.asarray(mask))
    )
    # reference: attention restricted to first 4 keys
    ref = _torch_mha(q, k[:, :4], v[:, :4], H)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("n,m,c", [(512, 512, 40), (512, 542, 64), (600, 600, 160),
                                   # small-KV cross-attention (CLIP context
                                   # M=77): one masked 128-padded KV block,
                                   # q-block growth in the mono kernel
                                   (512, 77, 40)])
def test_flash_matches_xla(rng, n, m, c):
    B, H = 1, 2
    q = rng.standard_normal((B, H, n, c), dtype=np.float32)
    k = rng.standard_normal((B, H, m, c), dtype=np.float32)
    v = rng.standard_normal((B, H, m, c), dtype=np.float32)
    scale = c ** -0.5
    out = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
                        256, 512, True)
    )
    sim = np.einsum("bhnc,bhmc->bhnm", q, k) * scale
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    ref = np.einsum("bhnm,bhmc->bhnc", attn, v)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("n,m,c", [(256, 256, 40), (300, 280, 64), (256, 77, 40)])
def test_flash_grads_match_xla(rng, n, m, c):
    """Flash backward kernels (recompute-softmax VJP) vs XLA attention grads,
    including padded/ragged sequence lengths."""
    B, H = 1, 2
    q = jnp.asarray(rng.standard_normal((B, H, n, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, m, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, m, c), dtype=np.float32))
    scale = c ** -0.5
    w = jnp.asarray(rng.standard_normal((B, H, n, c), dtype=np.float32))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale, 128, 128, True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        sim = jnp.einsum("bhnc,bhmc->bhnm", q, k) * scale
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.sum(jnp.einsum("bhnm,bhmc->bhnc", attn, v) * w)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"d{name}")


def test_flash_streaming_path_matches_xla(rng, monkeypatch):
    """Force the streaming (3-D grid, scratch-accumulator) kernel — the path
    the 4096x512 VAE attention takes — instead of the full-KV variant."""
    import layoutllm_t2i_tpu.ops.pallas.flash_attention as fa

    monkeypatch.setattr(fa, "_FULLKV_VMEM_BYTES", 0)
    B, H, n, m, c = 1, 2, 384, 300, 64
    q = rng.standard_normal((B, H, n, c), dtype=np.float32)
    k = rng.standard_normal((B, H, m, c), dtype=np.float32)
    v = rng.standard_normal((B, H, m, c), dtype=np.float32)
    scale = c ** -0.5
    out = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, 128, 128, True))
    sim = np.einsum("bhnc,bhmc->bhnm", q, k) * scale
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    ref = np.einsum("bhnm,bhmc->bhnc", attn, v)
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # grads through the streaming forward too
    w = jnp.asarray(rng.standard_normal((B, H, n, c), dtype=np.float32))
    g1 = jax.grad(lambda q, k, v: jnp.sum(
        fa.flash_attention(q, k, v, scale, 128, 128, True) * w),
        argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g2 = jax.grad(lambda q, k, v: jnp.sum(jnp.einsum(
        "bhnm,bhmc->bhnc", jax.nn.softmax(
            jnp.einsum("bhnc,bhmc->bhnm", q, k) * scale, axis=-1), v) * w),
        argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_adaptive_block_k_minimizes_padding(monkeypatch):
    """_prep shrinks block_k only when that reduces padded KV rows (the
    gated sites' M=4126 pads to 4224 at bk=128 instead of 4608 at bk=512);
    exact multiples keep the requested block."""
    from layoutllm_t2i_tpu.ops.pallas import flash_attention as fa

    def prep_mp(n, m, bq=256, bk=512):
        q = jnp.zeros((1, 1, n, 40))
        k = jnp.zeros((1, 1, m, 40))
        _, kf, _, bq_out, bk_out, _ = fa._prep(q, k, k, bq, bk, True)
        return kf.shape[1], bk_out

    monkeypatch.setenv("LLT2I_FLASH_ADAPTIVE_K", "1")
    mp, bk = prep_mp(4096, 4126)
    assert (mp, bk) == (4224, 128)
    mp, bk = prep_mp(4096, 4096)
    assert (mp, bk) == (4096, 512)      # tie -> largest block
    monkeypatch.setenv("LLT2I_FLASH_ADAPTIVE_K", "0")
    mp, bk = prep_mp(4096, 4126)
    assert (mp, bk) == (4608, 512)


def test_fused_qkv_projection_bitexact(rng, monkeypatch):
    """Self-attention sites stack q/k/v weights into ONE projection dot
    (reads x from HBM once); the stacked einsum must be bit-identical to
    three separate projections on the flash path."""
    from layoutllm_t2i_tpu.ops.attention import attention_with_projections

    B, N, H, C, D = 1, 512, 2, 40, 64
    x = jnp.asarray(rng.standard_normal((B, N, D), dtype=np.float32))
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    p = {
        "to_q": {"weight": jax.random.normal(ks[0], (D, H * C)) * 0.1},
        "to_k": {"weight": jax.random.normal(ks[1], (D, H * C)) * 0.1},
        "to_v": {"weight": jax.random.normal(ks[2], (D, H * C)) * 0.1},
        "to_out": {"0": {"weight": jax.random.normal(ks[3], (H * C, D)) * 0.1,
                         "bias": jnp.zeros((D,))}},
    }
    monkeypatch.setenv("LLT2I_FUSED_QKV", "1")
    fused = np.asarray(attention_with_projections(p, x, x, x, H, impl="flash"))
    monkeypatch.setenv("LLT2I_FUSED_QKV", "0")
    split = np.asarray(attention_with_projections(p, x, x, x, H, impl="flash"))
    np.testing.assert_array_equal(fused, split)


@pytest.mark.parametrize("hb", [2, 4])
@pytest.mark.parametrize("n,m,c", [(512, 512, 40), (512, 542, 40),
                                   (256, 300, 64)])
def test_flash_head_block_matches_xla(rng, monkeypatch, hb, n, m, c):
    """Head-blocked whole-row path (LLT2I_FLASH_HEAD_BLOCK>1): hb heads per
    grid program via batched dots — must be numerically identical to the
    per-head path. Covers masked KV padding (m=542, 300) and a BH not a
    multiple of hb falling back to hb=1 (B*H=4 with hb=4 is exercised; the
    B*H=2... case is the fallback assert below)."""
    import layoutllm_t2i_tpu.ops.pallas.flash_attention as fa

    B, H = 2, 4  # BH=8, divisible by 2 and 4
    q = rng.standard_normal((B, H, n, c), dtype=np.float32)
    k = rng.standard_normal((B, H, m, c), dtype=np.float32)
    v = rng.standard_normal((B, H, m, c), dtype=np.float32)
    scale = c ** -0.5
    monkeypatch.setenv("LLT2I_FLASH_HEAD_BLOCK", str(hb))
    out = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, 256, 512, True))
    sim = np.einsum("bhnc,bhmc->bhnm", q, k) * scale
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    ref = np.einsum("bhnm,bhmc->bhnc", attn, v)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_head_block_grads_match_xla(rng, monkeypatch):
    """The custom-VJP forward under head blocking emits the same lse layout,
    so gradients must match the XLA reference too."""
    import layoutllm_t2i_tpu.ops.pallas.flash_attention as fa

    B, H, n, m, c = 1, 4, 256, 256, 40
    q = jnp.asarray(rng.standard_normal((B, H, n, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, m, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, m, c), dtype=np.float32))
    scale = c ** -0.5

    def xla_attn(q, k, v):
        sim = jnp.einsum("bhnc,bhmc->bhnm", q, k) * scale
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum("bhnm,bhmc->bhnc", attn, v)

    w = jnp.asarray(rng.standard_normal((B, H, n, c), dtype=np.float32))
    monkeypatch.setenv("LLT2I_FLASH_HEAD_BLOCK", "2")
    g_ours = jax.grad(lambda q, k, v: jnp.sum(
        fa.flash_attention(q, k, v, scale, 128, 128, True) * w),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(xla_attn(q, k, v) * w),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
