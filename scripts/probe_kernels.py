"""On-chip probe of every Pallas kernel shape the production programs use.

Compiles and numerically checks each distinct (shape, dtype) instance of the
fused GroupNorm/LayerNorm kernels and the flash-attention forward against
the XLA reference math, one small program at a time — minutes instead of the
~15-minute full-PLMS-program compile when validating kernel changes on the
real chip. Prints PASS/FAIL per case and a summary line.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def probe_groupnorm():
    from layoutllm_t2i_tpu.ops.pallas.norms import (
        _gn_group_chunks, _gn_pallas, _gn_reference)

    # distinct UNet/VAE sites at bench scale (hw, C); bf16 activation path
    sites = [(64, 1280), (64, 2560), (256, 640), (256, 1280), (256, 1920),
             (256, 2560), (1024, 320), (1024, 640), (1024, 960), (1024, 1280),
             (4096, 320), (4096, 512)]
    rng = np.random.default_rng(0)
    ok = fail = skipped = 0
    for hw, c in sites:
        k = _gn_group_chunks(hw, c, 32, 2)
        if k is None:
            skipped += 1
            continue
        h = int(hw ** 0.5)
        x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.bfloat16)
        g = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.bfloat16)
        b = jnp.asarray(rng.uniform(-0.5, 0.5, c), jnp.bfloat16)
        try:
            out = np.asarray(_gn_pallas(x, g, b, 32, 1e-5, True, False, k),
                             np.float32)
            ref = np.asarray(_gn_reference(x, g, b, 32, 1e-5, True), np.float32)
            err = np.max(np.abs(out - ref))
            good = err < 0.05
            print(f"GN hw={hw} C={c} k={k}: {'PASS' if good else 'FAIL'} "
                  f"maxerr={err:.4f}")
            ok += good
            fail += not good
        except Exception as e:
            print(f"GN hw={hw} C={c} k={k}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}")
            fail += 1
    return ok, fail, skipped


def probe_groupnorm_rows():
    from layoutllm_t2i_tpu.ops.pallas.norms import (
        _gn_pallas_rows, _gn_reference, _gn_rows_block)

    # sites that exceed the single-block budget: UNet output-block concats
    # (hw=4096, C=640/960) and the 512^2/256^2 VAE maps
    sites = [(4096, 640), (4096, 960), (65536, 256), (262144, 128)]
    rng = np.random.default_rng(3)
    ok = fail = 0
    for hw, c in sites:
        rb = _gn_rows_block(hw, c, 2)
        if rb is None:
            print(f"GNrows hw={hw} C={c}: no legal row block")
            fail += 1
            continue
        h = int(hw ** 0.5)
        x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.bfloat16)
        g = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.bfloat16)
        b = jnp.asarray(rng.uniform(-0.5, 0.5, c), jnp.bfloat16)
        try:
            out = np.asarray(_gn_pallas_rows(x, g, b, 32, 1e-5, True, False, rb),
                             np.float32)
            ref = np.asarray(_gn_reference(x, g, b, 32, 1e-5, True), np.float32)
            err = np.max(np.abs(out - ref))
            good = err < 0.05
            print(f"GNrows hw={hw} C={c} rb={rb}: {'PASS' if good else 'FAIL'} "
                  f"maxerr={err:.4f}")
            ok += good
            fail += not good
        except Exception as e:
            print(f"GNrows hw={hw} C={c} rb={rb}: COMPILE FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}")
            fail += 1
    return ok, fail


def probe_layernorm():
    from layoutllm_t2i_tpu.ops.pallas.norms import _ln_pallas, _ln_reference

    rng = np.random.default_rng(1)
    ok = fail = 0
    for rows, c in [(8192, 320), (2048, 640), (512, 1280)]:
        x = jnp.asarray(rng.standard_normal((rows, c)), jnp.bfloat16)
        g = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.bfloat16)
        b = jnp.zeros((c,), jnp.bfloat16)
        try:
            out = np.asarray(_ln_pallas(x, g, b, 1e-5, False), np.float32)
            ref = np.asarray(_ln_reference(x, g, b, 1e-5), np.float32)
            err = np.max(np.abs(out - ref))
            good = err < 0.05
            print(f"LN rows={rows} C={c}: {'PASS' if good else 'FAIL'} "
                  f"maxerr={err:.4f}")
            ok += good
            fail += not good
        except Exception as e:
            print(f"LN rows={rows} C={c}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}")
            fail += 1
    return ok, fail


def probe_matmul():
    from layoutllm_t2i_tpu.ops.pallas.matmul import geglu_fused, linear_fused

    rng = np.random.default_rng(4)
    ok = fail = 0
    # (M, K, N): b=16 UNet FF outs and GEGLU projection halves per level
    lin = [(65536, 1280, 320), (16384, 2560, 640), (4096, 5120, 1280)]
    geg = [(65536, 320, 1280), (16384, 640, 2560), (4096, 1280, 5120)]
    for m, k, n in lin:
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.bfloat16)
        try:
            out = np.asarray(linear_fused(x, w, b), np.float32)
            ref = np.asarray(
                jnp.dot(x[:256], w, preferred_element_type=jnp.float32)
                + b.astype(jnp.float32), np.float32)
            err = np.max(np.abs(out[:256] - ref))
            good = err < 0.2
            print(f"MM {m}x{k}x{n}: {'PASS' if good else 'FAIL'} maxerr={err:.4f}")
            ok += good
            fail += not good
        except Exception as e:
            print(f"MM {m}x{k}x{n}: COMPILE FAIL {type(e).__name__}: {str(e)[:160]}")
            fail += 1
    for m, k, inner in geg:
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        wa = jnp.asarray(rng.standard_normal((k, inner)) * 0.02, jnp.bfloat16)
        wg = jnp.asarray(rng.standard_normal((k, inner)) * 0.02, jnp.bfloat16)
        ba = jnp.asarray(rng.standard_normal(inner) * 0.1, jnp.bfloat16)
        bg = jnp.asarray(rng.standard_normal(inner) * 0.1, jnp.bfloat16)
        try:
            out = np.asarray(geglu_fused(x, wa, wg, ba, bg), np.float32)
            a = np.asarray(jnp.dot(x[:256], wa, preferred_element_type=jnp.float32)
                           + ba.astype(jnp.float32), np.float32)
            g = np.asarray(jnp.dot(x[:256], wg, preferred_element_type=jnp.float32)
                           + bg.astype(jnp.float32), np.float32)
            from scipy.special import erf
            ref = a * (0.5 * g * (1 + erf(g / np.sqrt(2))))
            err = np.max(np.abs(out[:256] - ref))
            good = err < 0.2
            print(f"GEGLU {m}x{k}x{inner}: {'PASS' if good else 'FAIL'} "
                  f"maxerr={err:.4f}")
            ok += good
            fail += not good
        except Exception as e:
            print(f"GEGLU {m}x{k}x{inner}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")
            fail += 1
    return ok, fail


def probe_flash():
    from layoutllm_t2i_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(2)
    ok = fail = 0
    # (B, H, n, m, c): UNet ds=1 self / gated, ds=2, VAE single-head
    for bh, n, m, c in [((2, 8), 4096, 4096, 40), ((2, 8), 4096, 4126, 40),
                        ((2, 8), 4126, 4126, 40),  # gated site: partial q tail
                        ((2, 8), 1024, 1024, 80), ((2, 1), 4096, 4096, 512)]:
        B, H = bh
        q = jnp.asarray(rng.standard_normal((B, H, n, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, m, c)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, m, c)), jnp.bfloat16)
        scale = c ** -0.5
        try:
            out = np.asarray(flash_attention(q, k, v, scale), np.float32)
            # spot-check 64 random rows against XLA math
            qs = np.asarray(q, np.float32)[:, :, :64]
            sim = np.einsum("bhnc,bhmc->bhnm", qs,
                            np.asarray(k, np.float32)) * scale
            attn = np.exp(sim - sim.max(-1, keepdims=True))
            attn /= attn.sum(-1, keepdims=True)
            ref = np.einsum("bhnm,bhmc->bhnc", attn, np.asarray(v, np.float32))
            err = np.max(np.abs(out[:, :, :64] - ref))
            good = err < 0.05
            print(f"FLASH n={n} m={m} c={c}: {'PASS' if good else 'FAIL'} "
                  f"maxerr={err:.4f}")
            ok += good
            fail += not good
        except Exception as e:
            print(f"FLASH n={n} m={m} c={c}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}")
            fail += 1
    return ok, fail


if __name__ == "__main__":
    import sys as _sys

    only = _sys.argv[1] if len(_sys.argv) > 1 else None
    if only == "matmul":
        m_ok, m_fail = probe_matmul()
        print(f"SUMMARY matmul={m_ok}ok/{m_fail}fail")
        raise SystemExit(0)
    if only == "flash":
        f_ok, f_fail = probe_flash()
        print(f"SUMMARY flash={f_ok}ok/{f_fail}fail")
        raise SystemExit(0)
    g_ok, g_fail, g_skip = probe_groupnorm()
    r_ok, r_fail = probe_groupnorm_rows()
    l_ok, l_fail = probe_layernorm()
    m_ok, m_fail = probe_matmul()
    f_ok, f_fail = probe_flash()
    print(f"SUMMARY gn={g_ok}ok/{g_fail}fail/{g_skip}fallback "
          f"gnrows={r_ok}ok/{r_fail}fail "
          f"ln={l_ok}ok/{l_fail}fail matmul={m_ok}ok/{m_fail}fail "
          f"flash={f_ok}ok/{f_fail}fail")
