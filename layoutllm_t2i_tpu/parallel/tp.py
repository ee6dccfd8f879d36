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
    """(mesh, axis_name, style) when tracing under tp_mode, else None.

    style 'heads'   — Megatron-style: attention sharded by head, FF by inner
                      dim, one psum per block; convs/norms replicated.
    style 'spatial' — sequence/spatial sharding: activations sharded on the
                      H / token axis everywhere (GSPMD halo-exchanges the
                      3x3 convs), self-attention K/V all-gathered per block,
                      FF entirely local. Covers the conv path v1 leaves
                      replicated — the better real-chip scaling of the two.
    """
    return getattr(_CTX, "state", None)


@contextlib.contextmanager
def tp_mode(mesh: Mesh, axis: str = "model", style: str = "heads"):
    assert style in ("heads", "spatial"), style
    prev = getattr(_CTX, "state", None)
    _CTX.state = (mesh, axis, style)
    try:
        yield
    finally:
        _CTX.state = prev


def _constraint(x, spec: P):
    state = current_tp()
    if state is None:
        return x
    mesh = state[0]
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _axis_size(state) -> int:
    mesh, axis = state[0], state[1]
    return mesh.shape[axis]


def _shard_dim_or_replicate(x, state, dim: int, min_per_shard: int = 1):
    """Constrain dim `dim` sharded when it divides the mesh axis (with at
    least `min_per_shard` elements per device); otherwise constrain
    REPLICATED. Forcing a non-divisible dim onto the axis trips the SPMD
    partitioner's 'involuntary full rematerialization' fallback, observed to
    produce WRONG values (tiny-model H=4 over 8 devices: 0.12 abs error);
    stride-2 convs additionally miscompute at exactly 1 row per shard
    (verified exact at >=2 rows — see tests/test_tp.py). A clean replicated
    boundary sidesteps both. At SD geometry (H=64/32/16, heads=8) the
    production levels all shard on a v5e-8 axis; only the cheap 8x8 level
    replicates."""
    _, axis, _ = state
    n = _axis_size(state)
    if x.shape[dim] % n != 0 or x.shape[dim] // n < min_per_shard:
        return _constraint(x, P())
    spec = [None] * x.ndim
    spec[dim] = axis
    return _constraint(x, P(*spec))


def shard_q(x):
    """(b, n, h, c) split-head queries: 'heads' shards dim 2, 'spatial'
    shards the token dim 1 (each device owns its q rows end to end)."""
    state = current_tp()
    if state is None:
        return x
    style = state[2]
    return _shard_dim_or_replicate(x, state, 2 if style == "heads" else 1)


def shard_kv(x):
    """(b, m, h, c) split-head keys/values: 'heads' shards the head dim;
    'spatial' REPLICATES them (self-attention needs every kv row against
    the local q rows — this constraint is what makes GSPMD emit the one
    all-gather per block)."""
    state = current_tp()
    if state is None:
        return x
    style = state[2]
    return (_shard_dim_or_replicate(x, state, 2) if style == "heads"
            else _constraint(x, P()))


def shard_scores(x):
    """(b, h, n, m) attention scores."""
    state = current_tp()
    if state is None:
        return x
    style = state[2]
    return _shard_dim_or_replicate(x, state, 1 if style == "heads" else 2)


def shard_inner(x):
    """(..., inner) FF activation — only the 'heads' style shards the inner
    dim; under 'spatial' the FF is already row-parallel and fully local."""
    state = current_tp()
    if state is None or state[2] != "heads":
        return x
    return _shard_dim_or_replicate(x, state, x.ndim - 1)


def replicate_out(x):
    """After a row-parallel contraction in 'heads' style, force a replicated
    output so the partitioner chooses psum over resharding. No-op under
    'spatial' (outputs stay row-sharded)."""
    state = current_tp()
    if state is None or state[2] != "heads":
        return x
    return _constraint(x, P())


def shard_rows(x):
    """(b, H, W, C) conv activation or (b, n, d) token activation — under
    'spatial', shard dim 1 (image rows / tokens); 3x3 convs on the sharded
    H axis get their halo exchanges from the partitioner."""
    state = current_tp()
    if state is None or state[2] != "spatial":
        return x
    return _shard_dim_or_replicate(x, state, 1, min_per_shard=2)


def tp_mesh(num_devices: Optional[int] = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("model",))
