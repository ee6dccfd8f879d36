"""Multi-head attention core.

One entry point, `multi_head_attention`, used by every attention site in the
framework (UNet self/cross/gated attention, relation fuser, VAE attn block,
CLIP text encoder). Dispatches between:

  * ``xla``   — einsum + f32 softmax; XLA fuses this well for short kv;
  * ``flash`` — Pallas TPU flash-attention kernel (ops/pallas/flash_attention)
                for long self-attention sequences where materializing the
                (N x N) score matrix is HBM-bandwidth bound.

The reference computes this with explicit einsums per head
(GLIGEN/ldm/modules/attention.py:101-178); numerics here match it with
softmax carried out in float32.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# Flash kernel is profitable only for long sequences; below this the XLA path
# wins on kernel-launch and padding overheads.
_FLASH_MIN_Q_LEN = 512

# kernel block sizes, env-tunable for on-chip sweeps; 512x512 measured best
# on the b=16 UNet forward (scripts/sweep_flash.py, PERF.md round 2)
_BLOCK_Q = int(os.environ.get("LLT2I_FLASH_BLOCK_Q", "512"))
_BLOCK_K = int(os.environ.get("LLT2I_FLASH_BLOCK_K", "512"))

# Minimum KV length for the flash path. The text cross-attention sites
# (M=77 CLIP context) are below the 128 floor; routing them through the
# kernel (LLT2I_FLASH_MIN_KV=16) was measured 2.5% SLOWER end-to-end on
# chip (98.1 -> 100.6 ms/eval b=8 UNet fwd, PERF.md round-3c): XLA fuses
# the materialized softmax well enough that per-site grid launches plus
# the 77->128 masked-KV padding cost more than the saved score traffic.
# The floor stays 128 by measurement, not by caution.
_FLASH_MIN_KV = int(os.environ.get("LLT2I_FLASH_MIN_KV", "128"))


def _fused_qkv_enabled() -> bool:
    # self-attention sites project q/k/v from the SAME activation; a single
    # stacked dot reads x from HBM once instead of three times. Measured
    # END-TO-END SLOWER on-chip (0.9912 vs 1.0023 img/s): the (d,3,h,c)
    # einsum's s-major output forces XLA to relayout each qkv[i] slice back
    # to the flash kernel's (b,h,n,c) layout, costing more than the saved x
    # re-reads (XLA already CSEs much of the triple read). Default OFF;
    # kept behind LLT2I_FUSED_QKV=1 for A/B.
    return os.environ.get("LLT2I_FUSED_QKV", "0") == "1"


@functools.lru_cache(None)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _flash_enabled() -> bool:
    if os.environ.get("LLT2I_DISABLE_FLASH", "0") == "1":
        return False
    # TP latency mode: Pallas custom calls don't partition under GSPMD.
    # 'spatial' style keeps the kernel through an explicit shard_map over
    # the token axis (_tp_spatial_flash); 'heads' routes through the XLA
    # path, which the partitioner shards by head.
    from ..parallel.tp import current_tp
    return current_tp() is None


def _tp_spatial_flash_eligible(n: int) -> bool:
    """True when the spatial-TP flash route applies: tracing under
    tp_mode('spatial'), on TPU (or forced), and n q-token rows split over the
    mesh into 128-multiples (the kernel's sublane rule)."""
    from ..parallel.tp import current_tp

    state = current_tp()
    if state is None or state[2] != "spatial":
        return False
    if not (_on_tpu() or os.environ.get("LLT2I_TP_FLASH_FORCE") == "1"):
        return False
    mesh, axis, _ = state
    ndev = mesh.shape[axis]
    return n % ndev == 0 and (n // ndev) % 128 == 0


def _tp_spatial_flash(qh, kh, vh, scale):
    """flash attention under 'spatial' TP: shard_map over the mesh axis —
    each device runs the Pallas kernel on ITS q-token rows against the full
    (replicated) K/V. Non-causal attention rows are independent, so this is
    exact; K/V for the biggest site is (b=2, h=8, 4126, 40) bf16 ≈ 2.6 MB
    replicated — negligible. Caller gates on _tp_spatial_flash_eligible."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.tp import current_tp

    mesh, axis, _ = current_tp()
    from .pallas.flash_attention import flash_attention

    def local(q, k, v):
        return flash_attention(q, k, v, scale, _BLOCK_Q, _BLOCK_K)

    spec_q = P(None, None, axis, None)
    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no vma
    # annotation, which the varying-mesh-axes checker rejects otherwise
    return shard_map(local, mesh=mesh, in_specs=(spec_q, P(), P()),
                     out_specs=spec_q, check_vma=False)(qh, kh, vh)


def attention_with_projections(p, x, key, value, num_heads: int, mask=None,
                               impl: str = "auto"):
    """Full attention block given the projection params: q/k/v projections,
    core attention, output projection.

    On the flash path the head split/merge is folded into the projection
    einsums (``bnd,dhc->bhnc`` in, ``bhnc,hcd->bnd`` out) so no transposed
    copy of q/k/v or the output is ever materialized in HBM.

    p: {'to_q','to_k','to_v','to_out':{'0'}} in torch-name layout.
    """
    b, n, _ = x.shape
    m = key.shape[1]
    inner = p["to_q"]["weight"].shape[1]
    c = inner // num_heads
    scale = c ** -0.5

    if impl == "auto":
        use_flash = (
            _on_tpu() and _flash_enabled() and mask is None
            and n >= _FLASH_MIN_Q_LEN and m >= _FLASH_MIN_KV
        )
        impl = "flash" if use_flash else "xla"

    def project_heads():
        wq = p["to_q"]["weight"].astype(x.dtype).reshape(-1, num_heads, c)
        wk = p["to_k"]["weight"].astype(x.dtype).reshape(-1, num_heads, c)
        wv = p["to_v"]["weight"].astype(x.dtype).reshape(-1, num_heads, c)
        if key is x and value is x and _fused_qkv_enabled():
            w = jnp.stack([wq, wk, wv], axis=1)  # (d, 3, h, c)
            qkv = jnp.einsum("bnd,dshc->sbhnc", x, w)
            return qkv[0], qkv[1], qkv[2]
        qh = jnp.einsum("bnd,dhc->bhnc", x, wq)
        kh = jnp.einsum("bmd,dhc->bhmc", key, wk)
        vh = jnp.einsum("bmd,dhc->bhmc", value, wv)
        return qh, kh, vh

    def project_out(out):
        po = p["to_out"]["0"]
        wo = po["weight"].astype(x.dtype).reshape(num_heads, c, -1)
        y = jnp.einsum("bhnc,hcd->bnd", out, wo)
        return y + po["bias"].astype(x.dtype)

    if (impl == "xla" and mask is None and n >= _FLASH_MIN_Q_LEN
            and _tp_spatial_flash_eligible(n)):
        # spatial TP: keep the Pallas kernel via shard_map over token rows
        qh, kh, vh = project_heads()
        return project_out(_tp_spatial_flash(qh, kh, vh, scale))

    if impl == "flash":
        from .pallas.flash_attention import flash_attention

        qh, kh, vh = project_heads()
        return project_out(flash_attention(qh, kh, vh, scale,
                                           _BLOCK_Q, _BLOCK_K))

    def lin(pp, t):
        return jnp.dot(t, pp["weight"].astype(t.dtype))

    out = multi_head_attention(lin(p["to_q"], x), lin(p["to_k"], key),
                               lin(p["to_v"], value), num_heads, mask=mask,
                               impl="xla")
    po = p["to_out"]["0"]
    # under tp_mode `out` is head-sharded: the output projection contracts
    # over the sharded h*c dim (row-parallel) — constraining the result
    # replicated makes the partitioner emit ONE psum here
    from ..parallel.tp import replicate_out
    y = replicate_out(jnp.dot(out, po["weight"].astype(x.dtype)))
    return y + po["bias"].astype(x.dtype)


def multi_head_attention(q, k, v, num_heads: int, mask=None, impl: str = "auto"):
    """Scaled dot-product attention over packed heads.

    q: (B, N, H*C); k, v: (B, M, H*C); mask: optional (B, M) key-validity
    bool/0-1 mask (broadcast over heads and queries, matching reference
    CrossAttention.fill_inf_from_mask). Returns (B, N, H*C).
    """
    b, n, hc = q.shape
    m = k.shape[1]
    c = hc // num_heads
    scale = c ** -0.5

    if impl == "auto":
        use_flash = (
            _on_tpu()
            and _flash_enabled()
            and mask is None
            and n >= _FLASH_MIN_Q_LEN
            and m >= _FLASH_MIN_KV
        )
        impl = "flash" if use_flash else "xla"

    if impl == "flash":
        from .pallas.flash_attention import flash_attention

        qh = q.reshape(b, n, num_heads, c).transpose(0, 2, 1, 3)  # B,H,N,C
        kh = k.reshape(b, m, num_heads, c).transpose(0, 2, 1, 3)
        vh = v.reshape(b, m, num_heads, c).transpose(0, 2, 1, 3)
        out = flash_attention(qh, kh, vh, scale, _BLOCK_Q, _BLOCK_K)
        return out.transpose(0, 2, 1, 3).reshape(b, n, hc)

    # head-split via einsum over the packed layout — XLA folds the head
    # transposes into the matmuls instead of materializing copies. Under
    # tp_mode the head-axis constraints make GSPMD partition every einsum
    # by head (parallel/tp.py).
    from ..parallel.tp import shard_kv, shard_q, shard_scores

    qh = shard_q(q.reshape(b, n, num_heads, c))
    kh = shard_kv(k.reshape(b, m, num_heads, c))
    vh = shard_kv(v.reshape(b, m, num_heads, c))
    sim = jnp.einsum("bnhc,bmhc->bhnm", qh, kh, preferred_element_type=jnp.float32)
    sim = shard_scores(sim * scale)
    if mask is not None:
        key_mask = mask.astype(bool)[:, None, None, :]
        sim = jnp.where(key_mask, sim, _NEG_INF)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = shard_q(jnp.einsum("bhnm,bmhc->bnhc", attn, vh))
    return out.reshape(b, n, hc)
