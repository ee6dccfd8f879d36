"""Pallas GEMM (bias/GEGLU epilogues) vs plain XLA math, interpreter mode.

These kernels back nn.linear / nn.geglu_ff on TPU for the big FF/projection
sites (PERF.md round 2: XLA's layout assignment drove those dots to 5-20%
MFU emitters)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.ops.pallas.matmul import (
    _eligible, _geglu_call, _mm_call, geglu_fused, linear_fused,
)


@pytest.mark.parametrize("m,k,n", [
    (1024, 320, 2560),   # 64^2 FF projection (per-half)
    (1024, 1280, 320),   # 64^2 FF output
    (2048, 640, 512),
    (1024, 384, 40),     # narrow N -> lane-padded full block
])
def test_matmul_bias(rng, m, k, n):
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    out = _mm_call(x, w, b.reshape(1, -1), jnp.zeros((1, 1)), True, True, False)
    ref = x @ w + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_matmul_no_bias(rng):
    x = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    out = linear_fused(x, w, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ w), atol=2e-4)


def test_geglu_kernel_matches_reference(rng):
    m, k, inner = 512, 320, 1280
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.2)
    wa = jnp.asarray(rng.standard_normal((k, inner)).astype(np.float32) * 0.05)
    wg = jnp.asarray(rng.standard_normal((k, inner)).astype(np.float32) * 0.05)
    ba = jnp.asarray(rng.standard_normal(inner).astype(np.float32) * 0.1)
    bg = jnp.asarray(rng.standard_normal(inner).astype(np.float32) * 0.1)
    out = geglu_fused(x, wa, wg, ba, bg)
    a = x @ wa + ba
    g = x @ wg + bg
    ref = a * jax.nn.gelu(g, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


def test_linear_grads_match_xla(rng):
    x = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    gw = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))

    g1 = jax.grad(lambda x, w, b: jnp.sum(linear_fused(x, w, b) * gw),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda x, w, b: jnp.sum((x @ w + b) * gw),
                  argnums=(0, 1, 2))(x, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-3)


def test_geglu_grads_match_xla(rng):
    m, k, inner = 256, 128, 256
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32) * 0.2)
    wa = jnp.asarray(rng.standard_normal((k, inner)).astype(np.float32) * 0.1)
    wg = jnp.asarray(rng.standard_normal((k, inner)).astype(np.float32) * 0.1)
    ba = jnp.zeros(inner)
    bg = jnp.zeros(inner)

    def ref(x, wa, wg):
        a = x @ wa + ba
        g = x @ wg + bg
        return jnp.sum((a * jax.nn.gelu(g, approximate=False)) ** 2)

    g1 = jax.grad(lambda *a: jnp.sum(geglu_fused(*a, ba, bg) ** 2),
                  argnums=(0, 1, 2))(x, wa, wg)
    g2 = jax.grad(ref, argnums=(0, 1, 2))(x, wa, wg)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)


def test_eligibility_gate():
    assert _eligible(65536, 320, 2560)      # 64^2 b16 FF proj halves
    assert _eligible(65536, 1280, 320)      # FF out
    assert not _eligible(480, 768, 320)     # gated fuser objs linear (tiny M)
    assert not _eligible(1232, 320, 320)    # non-decomposable M


def test_nn_linear_geglu_unchanged_on_cpu(rng):
    """Off-TPU the public ops must take the XLA path and match exactly."""
    from layoutllm_t2i_tpu.ops import nn

    p = {"weight": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(32).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((4, 10, 64)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(nn.linear(p, x)),
                               np.asarray(x @ p["weight"] + p["bias"]),
                               atol=1e-5)


# --- fully fused FF (ops/pallas/ffn.py): up-proj + GEGLU + down-proj +
# residual in one kernel, gated activation VMEM-resident (PERF.md round 3)

@pytest.mark.parametrize("m,k,inner", [
    (2048, 320, 1280),   # 64^2 transformer FF (the dominant site)
    (1024, 640, 2560),   # 32^2
    (1024, 1280, 5120),  # 16^2
])
def test_ffn_fused_matches_reference(rng, m, k, inner):
    from layoutllm_t2i_tpu.ops.pallas.ffn import _ffn_ref, ffn_geglu_fused

    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x = f((m, k)) * 0.2
    wa, wg = f((k, inner)) * 0.05, f((k, inner)) * 0.05
    ba, bg = f(inner) * 0.1, f(inner) * 0.1
    w2, b2 = f((inner, k)) * 0.05, f(k) * 0.1
    r = f((m, k))
    out = ffn_geglu_fused(x, wa, wg, ba, bg, w2, b2, r)
    ref = _ffn_ref(x, wa, wg, ba, bg, w2, b2, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_ffn_fused_grads_match_xla(rng):
    from layoutllm_t2i_tpu.ops.pallas.ffn import _ffn_ref, ffn_geglu_fused

    m, k, inner = 1024, 256, 512
    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (f((m, k)) * 0.2, f((k, inner)) * 0.05, f((k, inner)) * 0.05,
            f(inner) * 0.1, f(inner) * 0.1, f((inner, k)) * 0.05,
            f(k) * 0.1, f((m, k)))
    gy = f((m, k))
    g1 = jax.grad(lambda *a: jnp.sum(ffn_geglu_fused(*a) * gy),
                  argnums=tuple(range(8)))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_ffn_ref(*a) * gy),
                  argnums=tuple(range(8)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=1e-3)


def test_geglu_ff_res_routes_and_matches(rng, monkeypatch):
    """nn.geglu_ff_res falls back to geglu_ff(...)+r off-TPU but both paths
    agree numerically (the kernel itself is checked above in interpret)."""
    from layoutllm_t2i_tpu.ops import nn as nnops

    k, inner, m = 320, 1280, 1024
    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    p = {"net": {"0": {"proj": {"weight": f((k, 2 * inner)) * 0.05,
                                "bias": f(2 * inner) * 0.1}},
                 "2": {"weight": f((inner, k)) * 0.05, "bias": f(k) * 0.1}}}
    x = f((2, m // 2, k)) * 0.2
    r = f((2, m // 2, k))
    out = nnops.geglu_ff_res(p, x, r)
    ref = nnops.geglu_ff(p, x) + r
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("m,k,inner", [
    (2048, 320, 1280),
    (1024, 640, 2560),
    (1024, 1280, 5120),  # 16^2 site — covers the bn=128 K>=1280 block path
])
def test_ffn_ln_fused_matches_reference(rng, m, k, inner):
    from layoutllm_t2i_tpu.ops.pallas.ffn import _ffn_ln_ref, ffn_ln_geglu_fused

    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x = f((m, k)) * 0.2
    wa, wg = f((k, inner)) * 0.05, f((k, inner)) * 0.05
    ba, bg = f(inner) * 0.1, f(inner) * 0.1
    w2, b2 = f((inner, k)) * 0.05, f(k) * 0.1
    gamma, beta = 1.0 + f(k) * 0.1, f(k) * 0.1
    out = ffn_ln_geglu_fused(x, wa, wg, ba, bg, w2, b2, gamma, beta)
    ref = _ffn_ln_ref(x, wa, wg, ba, bg, w2, b2, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_ffn_ln_fused_grads_match_xla(rng):
    from layoutllm_t2i_tpu.ops.pallas.ffn import _ffn_ln_ref, ffn_ln_geglu_fused

    m, k, inner = 1024, 256, 512
    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (f((m, k)) * 0.2, f((k, inner)) * 0.05, f((k, inner)) * 0.05,
            f(inner) * 0.1, f(inner) * 0.1, f((inner, k)) * 0.05,
            f(k) * 0.1, 1.0 + f(k) * 0.1, f(k) * 0.1)
    gy = f((m, k))
    g1 = jax.grad(lambda *a: jnp.sum(ffn_ln_geglu_fused(*a) * gy),
                  argnums=tuple(range(9)))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_ffn_ln_ref(*a) * gy),
                  argnums=tuple(range(9)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=1e-3)


def test_ln_geglu_ff_res_fallback_matches(rng):
    from layoutllm_t2i_tpu.ops import nn as nnops

    k, inner, m = 320, 1280, 1024
    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    p_ff = {"net": {"0": {"proj": {"weight": f((k, 2 * inner)) * 0.05,
                                   "bias": f(2 * inner) * 0.1}},
                    "2": {"weight": f((inner, k)) * 0.05, "bias": f(k) * 0.1}}}
    p_n = {"weight": 1.0 + f(k) * 0.1, "bias": f(k) * 0.1}
    x = f((2, m // 2, k)) * 0.2
    out = nnops.ln_geglu_ff_res(p_ff, p_n, x)
    ref = nnops.geglu_ff(p_ff, nnops.layer_norm(p_n, x)) + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_ffn_ln_scaled_matches_reference(rng):
    from layoutllm_t2i_tpu.ops.pallas.ffn import (
        _ffn_ln_scaled_ref, ffn_ln_geglu_scaled)

    m, k, inner = 1024, 320, 1280
    f = lambda s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    args = (f((m, k)) * 0.2, f((k, inner)) * 0.05, f((k, inner)) * 0.05,
            f(inner) * 0.1, f(inner) * 0.1, f((inner, k)) * 0.05,
            f(k) * 0.1, 1.0 + f(k) * 0.1, f(k) * 0.1)
    for s in (0.0, 0.37):
        out = ffn_ln_geglu_scaled(*args, jnp.float32(s))
        ref = _ffn_ln_scaled_ref(*args, jnp.float32(s))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=1e-4)
