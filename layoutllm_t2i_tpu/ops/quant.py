"""Weight-only int8 quantization for the inference path (opt-in).

Motivation (latency serving): at batch 1 a PLMS step reads every UNet
weight once per UNet eval; in bf16 that is ~1.7 GB/step of HBM traffic for
SD-1.4 geometry, which dominates when the MXU is underutilized at small
batch. Storing weights as int8 with a per-output-channel scale halves the
weight bytes; the dequant (``convert + broadcast-mul``) is emitted at each
*use site inside the sampling scan*, where XLA fuses it into the consuming
dot/conv, so the int8 bytes are what actually crosses HBM.

Design: ``QuantTensor`` is a registered pytree that impersonates the dense
weight array — ``.shape``/``.dtype``/``.astype``/``__jax_array__``/
``__getitem__`` — so the model code in ``ops/nn.py`` / ``ops/attention.py``
(which only ever does ``w.astype(x.dtype)``, ``w.shape``, ``w[0, 0]``)
needs no changes and the params still travel as jit ARGUMENTS (the remote
compiler rejects GB-scale closures, PERF.md).

The Pallas FFN fast path is skipped for quantized weights: a pallas_call
operand cannot absorb the dequant as a fusion producer, so XLA would have
to materialize a bf16 copy of the weight in HBM every scan step — strictly
worse than reading it dense. The XLA dot path (which fuses the dequant)
is used instead; an int8-aware FFN kernel (in-VMEM dequant) is the natural
follow-up if the on-chip latency A/B pays off.

This is weight-only PTQ (no activation quantization): the matmul still
runs in bf16 on the MXU, so it is a bandwidth/footprint optimization, not
a compute-precision change. Per-channel symmetric scales keep the max
per-channel round-off at amax/254. The reference has no quantization
support at all (fp16 autocast only, GLIGEN/gligen_inference.py:236).
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantTensor:
    """int8 weight + per-last-axis-channel f32 scale, posing as a dense array.

    ``q``: int8, the logical shape; ``scale``: f32 ``(shape[-1],)``.
    Dequant computes in f32 then casts once (bf16 scales would add ~0.4%
    round-off on top of int8's); XLA fuses the whole chain into the
    consumer.
    """

    def __init__(self, q, scale, dtype=jnp.bfloat16):
        self.q = q
        self.scale = scale
        self._dtype = jnp.dtype(dtype)

    # -- array impersonation ------------------------------------------------

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def size(self):
        return self.q.size

    @property
    def dtype(self):
        return self._dtype

    def astype(self, dtype):
        return (self.q.astype(jnp.float32) * self.scale).astype(dtype)

    def dequantize(self):
        return self.astype(self._dtype)

    def __jax_array__(self):
        return self.dequantize()

    def __getitem__(self, idx):
        # correctness-first: dequantize then index (XLA DCEs the unused
        # slices); the only indexed site is the 1x1-conv (1,1,Cin,Cout)
        # kernel in ops/nn.py conv2d, where this is free
        return self.dequantize()[idx]

    def reshape(self, *shape):
        return self.dequantize().reshape(*shape)

    def __repr__(self):
        return (f"QuantTensor(shape={tuple(self.q.shape)}, "
                f"dtype={self._dtype.name})")

    # -- pytree protocol ----------------------------------------------------

    def tree_flatten(self):
        return (self.q, self.scale), self._dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        return cls(q, scale, aux)


def is_quantized(x: Any) -> bool:
    return isinstance(x, QuantTensor)


def quantize_tensor(w, dtype: Optional[Any] = None) -> QuantTensor:
    """Symmetric per-output-channel int8 quantization over the LAST axis
    (the output-channel axis in both this repo's (in, out) linear and HWIO
    conv layouts, ops/nn.py:1-10)."""
    logical = jnp.dtype(dtype) if dtype is not None else jnp.asarray(w).dtype
    wf = np.asarray(jax.device_get(w), dtype=np.float32)
    amax = np.max(np.abs(wf), axis=tuple(range(wf.ndim - 1)))
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(wf / scale), -127, 127).astype(np.int8)
    return QuantTensor(jnp.asarray(q), jnp.asarray(scale), logical)


def quantize_params(tree, min_size: int = 1 << 16, dtype: Optional[Any] = None):
    """Quantize every ``weight`` leaf with ndim>=2 and ``size >= min_size``.

    The default floor keeps norms/embeddings/tiny convs (incl. the
    restorable SD first conv that make_cfg_denoiser blends with jnp.where)
    dense; the big attention/FF/conv kernels — the weight bytes that matter
    — all clear it at SD geometry.
    """

    def rec(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "weight" and not isinstance(v, dict)
                        and getattr(v, "ndim", 0) >= 2
                        and getattr(v, "size", 0) >= min_size
                        and not is_quantized(v)):
                    out[k] = quantize_tensor(v, dtype)
                else:
                    out[k] = rec(v)
            return out
        return node

    return rec(tree)


def dequantize_params(tree):
    """Inverse of quantize_params (returns dense arrays at logical dtype) —
    for A/B tests and for exporting a quantized bundle back to dense."""
    return jax.tree_util.tree_map(
        lambda x: x.dequantize() if is_quantized(x) else x, tree,
        is_leaf=is_quantized)


def quantized_bytes(tree) -> int:
    """Device bytes of the weight leaves (diagnostic for the footprint win)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree, is_leaf=is_quantized):
        if is_quantized(leaf):
            total += leaf.q.size + 4 * leaf.scale.size
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total
