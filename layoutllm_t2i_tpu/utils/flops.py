"""Analytic FLOP counting by walking a jaxpr.

``compiled.cost_analysis()`` misses every Pallas custom call (XLA sees an
opaque custom-call with unknown cost), and the flash-attention + fused-FFN
kernels carry most of this framework's matmul FLOPs — so MFU computed from
XLA's own numbers would be a large under-count. This walker counts
``dot_general`` / ``conv_general_dilated`` FLOPs directly from the traced
jaxpr instead, recursing into:

  * ``scan``            — body count x trip length (the samplers' segments
                          each contribute their exact step counts),
  * ``pallas_call``     — kernel-jaxpr count x prod(grid),
  * ``cond``            — branch cost per ``cond_mode`` (min/max/mean; see
                          count_jaxpr_flops — callers with a static branch
                          frequency, e.g. encoder-propagation key steps,
                          interpolate min/max themselves),
  * ``while``           — body counted ONCE (trip count unknowable; none of
                          the hot paths use it),
  * any other call-like primitive (pjit, remat, custom_vjp, ...) via its
    jaxpr-typed params.

Elementwise / VPU work (softmax exp, norms, GELU) is deliberately excluded:
MFU here is the MXU-FLOP utilization number used throughout PERF.md
(2*M*N*K per matmul, 197 bf16 TFLOP/s peak on v5e-1).
"""
from __future__ import annotations

import math
import os


import jax
from jax.extend import core as jcore


def _prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= float(x)
    return out


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    (lc, rc), (lb, _rb) = eqn.params["dimension_numbers"]
    batch = _prod(lhs[i] for i in lb)
    contract = _prod(lhs[i] for i in lc)
    m = _prod(lhs[i] for i in range(len(lhs)) if i not in set(lc) | set(lb))
    n = _prod(rhs[i] for i in range(len(rhs)) if i not in set(rc) | set(_rb))
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    # 2 x out_elems (batch x out_spatial x out_ch) x kernel_spatial x
    # in_ch_per_group; rhs dim order comes from the dimension numbers
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    k_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
    in_ch_per_group = float(rhs[dn.rhs_spec[1]])
    return 2.0 * _prod(out) * k_spatial * in_ch_per_group


_CALL_JAXPR_KEYS = ("jaxpr", "call_jaxpr", "fun_jaxpr", "cond_jaxpr", "body_jaxpr")


def count_jaxpr_flops(jaxpr, cond_mode: str = "min",
                      key_frac: float | None = None) -> float:
    """Sum matmul/conv FLOPs over a (Closed)Jaxpr. See module docstring.

    ``cond_mode`` picks the ``lax.cond``/``switch`` branch cost: ``min``
    (default) is the steady-state cost — exact for every headline config,
    where the only data-dependent branch is the PLMS/DPM warm start taken
    once per trajectory (undercounts ~1% of a 50-step sample); ``max``
    counts the expensive branch everywhere; ``mean`` averages.

    ``key_frac`` (encoder-propagation counting, arXiv:2312.09608): the
    per-step ``is_key`` cond alternates at a statically known fraction k.
    A global ``max`` pass cannot isolate it — it also charges the PLMS/DPM
    warm-start cond's Heun branch (one extra full UNet eval) at EVERY step,
    which is how round 4's first enc2 MFU came out above the exact path's
    (impossible; PERF.md round 4 note (a)). The two cond families are
    structurally distinguishable: warm-start/order-fallback conds have a
    ZERO-matmul cheap branch (linear history combinations), while the
    is_key cond's cheap branch is the decoder-only forward (large). So with
    ``key_frac=k``: conds whose cheapest branch has nonzero matmul cost are
    counted as ``k*max + (1-k)*min``; zero-cheap-branch conds count their
    min branch (the same once-per-trajectory Heun undercount the exact
    configs accept). Overrides ``cond_mode`` at cond sites."""
    if isinstance(jaxpr, jcore.ClosedJaxpr):
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += count_jaxpr_flops(eqn.params["jaxpr"], cond_mode,
                                       key_frac) * float(
                eqn.params["length"])
        elif name == "cond":
            branches = eqn.params["branches"]
            if branches:
                costs = [count_jaxpr_flops(b, cond_mode, key_frac)
                         for b in branches]
                if key_frac is not None:
                    lo, hi = min(costs), max(costs)
                    total += (key_frac * hi + (1.0 - key_frac) * lo
                              if lo > 0 else lo)
                else:
                    total += {"min": min, "max": max,
                              "mean": lambda c: sum(c) / len(c)}[cond_mode](costs)
        elif name == "while":
            total += count_jaxpr_flops(eqn.params["body_jaxpr"], cond_mode,
                                       key_frac)
        elif name == "pallas_call":
            gm = eqn.params.get("grid_mapping")
            grid = getattr(gm, "grid", ()) or ()
            total += count_jaxpr_flops(eqn.params["jaxpr"], cond_mode,
                                       key_frac) * _prod(grid)
        else:
            # first matching key ONLY: a custom_vjp/jvp eqn can carry more
            # than one jaxpr-typed param for the same computation — summing
            # them all would double count
            for key in _CALL_JAXPR_KEYS:
                sub = eqn.params.get(key) if eqn.params else None
                if isinstance(sub, (jcore.ClosedJaxpr, jcore.Jaxpr)):
                    total += count_jaxpr_flops(sub, cond_mode, key_frac)
                    break
    return total


def count_fn_flops(fn, *args, cond_mode: str = "min",
                   key_frac: float | None = None, **kwargs) -> float:
    """Trace ``fn`` abstractly and count its matmul/conv FLOPs."""
    return count_jaxpr_flops(jax.make_jaxpr(fn)(*args, **kwargs), cond_mode,
                             key_frac)


# Peak MXU throughput for MFU reporting. v5e: 197 bf16 TFLOP/s per chip
# (PERF.md "Context"); override for other parts via LLT2I_PEAK_TFLOPS.
def peak_tflops() -> float:
    env = os.environ.get("LLT2I_PEAK_TFLOPS")
    if env:
        return float(env)
    return 197.0


def mfu(flops: float, seconds: float, n_chips: int = 1) -> float:
    """Achieved-FLOPs / peak for the run. Returns a fraction in [0, ~1]."""
    if seconds <= 0 or not math.isfinite(seconds):
        return 0.0
    return flops / seconds / (peak_tflops() * 1e12 * n_chips)
