"""Tensor-parallel LATENCY mode for inference.

`generate_sharded` (prompt-DP) is the throughput-optimal layout — zero
steady-state communication, linear scaling (PERF.md). TP is the other axis:
shard the PER-IMAGE compute over the mesh so a single image's 50-step
denoise finishes in ~1/N the wall clock (serving p50, interactive demo).
The reference has no TP story at all (its only parallelism is DDP,
GLIGEN/main.py:59-65).

TPU-native design: no hand-written collectives. The model stays the same
pure function; TP is expressed as GSPMD **activation sharding constraints**
at the two partition-friendly interior cuts:

  * attention — shard the HEAD axis (b, n, h, c): every einsum around it
    partitions cleanly; the output projection contracts over the sharded
    h*c dim, so XLA inserts ONE psum per attention block (the Megatron
    column→row pattern, derived by the partitioner instead of hand-coded).
  * GEGLU FF — shard the INNER (4*d) axis of both up-projections; the
    elementwise gate stays local; the down-projection contracts over the
    sharded inner dim → again one psum.

Params and conv/norm activations stay replicated in v1 (convs are ~15-20%
of the step; Amdahl caps v1 TP at ~3-4x on 8 chips — the honest number is
in PERF.md). Pallas custom calls don't partition under GSPMD, so tp_mode()
also routes attention/FF through the XLA paths (the kernel gates in
ops/nn.py and ops/attention.py check `current_tp()`).

The context is TRACE-time state: enter `tp_mode(mesh)` while tracing/jitting
the TP program (InferencePipeline.sample_latents_tp does this); the traced
constraints are baked into that program only.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_CTX = threading.local()


def current_tp() -> Optional[tuple]:
    """(mesh, axis_name) when tracing under tp_mode, else None."""
    return getattr(_CTX, "state", None)


@contextlib.contextmanager
def tp_mode(mesh: Mesh, axis: str = "model"):
    prev = getattr(_CTX, "state", None)
    _CTX.state = (mesh, axis)
    try:
        yield
    finally:
        _CTX.state = prev


def _constraint(x, spec: P):
    state = current_tp()
    if state is None:
        return x
    mesh, _ = state
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_heads(x):
    """(b, n, h, c) or (b, h, n, m) — shard dim 2 or 1? Callers pass (b, n,
    h, c) layout; shard the head axis (dim 2)."""
    state = current_tp()
    if state is None:
        return x
    _, axis = state
    return _constraint(x, P(None, None, axis, None))


def shard_scores(x):
    """(b, h, n, m) attention scores — shard the head axis (dim 1)."""
    state = current_tp()
    if state is None:
        return x
    _, axis = state
    return _constraint(x, P(None, axis, None, None))


def shard_inner(x):
    """(..., inner) FF activation — shard the trailing inner dim."""
    state = current_tp()
    if state is None:
        return x
    _, axis = state
    return _constraint(x, P(*([None] * (x.ndim - 1) + [axis])))


def replicate_out(x):
    """Force a replicated output after a row-parallel contraction (makes the
    partitioner choose psum over resharding)."""
    return _constraint(x, P())


def tp_mesh(num_devices: Optional[int] = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("model",))
