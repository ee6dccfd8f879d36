"""layoutllm_t2i_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of LayoutLLM-T2I.

A coarse-to-fine text-to-image framework:
  1. layout planning (host/LLM): policy network picks in-context examples,
     an LLM emits ``object: [x, y, w, h]`` layouts (``pipeline.planner``);
  2. layout-grounded latent diffusion (device): a GLIGEN-style relation-aware
     SD-1.x UNet + VAE + CLIP text encoder, sampled with PLMS/DDIM compiled
     into a single ``lax.scan`` (``models``, ``diffusion``);
  3. REINFORCE policy training and relation-aware diffusion training
     (``training``).

Reference behavior: /root/reference (LayoutLLM-T2I, ACM MM'23). The
implementation here is an independent TPU-first design: pure functions over
parameter pytrees, fixed shapes, device meshes via jax.sharding, and Pallas
kernels for the hot attention ops.
"""

__version__ = "0.1.0"
