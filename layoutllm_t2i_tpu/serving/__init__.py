"""Production serving: micro-batched request server around the jitted
pipeline.

TPU-idiomatic serving means FIXED-SHAPE batching: the sampler is one
compiled program per (batch, steps) signature, so the server coalesces
concurrent requests into a fixed-size batch (padding with repeats) instead
of dispatching per-request — one warm program, no recompiles, full-chip
utilization under load. The reference ships only a per-request gradio demo
(GLIGEN/demo/); this subsystem is the deployment counterpart.
"""
from .batcher import MicroBatcher  # noqa: F401
