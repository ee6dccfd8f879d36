"""Serving CLI: micro-batched HTTP generation server.

    python -m layoutllm_t2i_tpu.cli.serve --ckpt ckpt.pth --port 8501 \
        --batch 8 --max_delay_ms 80

    curl -s localhost:8501/generate -d '{"prompt": "a dog in a park",
        "layout": [{"phrase": "dog", "box": [0.2, 0.4, 0.5, 0.9]}]}' \
        -o out.png
    curl -s localhost:8501/metrics

--small serves a tiny random-weight model for smoke testing. Requests
coalesce into fixed --batch dispatches (see serving/batcher.py); at the
measured ~1.0 img/s/chip a full batch of 8 clears in ~8 s with every row
doing useful work. The reference has no serving path (its demo is a
per-request gradio app, GLIGEN/demo/app.py) — this is the deployment
counterpart the TPU rebuild adds.
"""
from __future__ import annotations

import argparse


class TPPipeAdapter:
    """Presents generate_tp under MicroBatcher's generate() contract
    (incl. per-request seeds) with the mesh/style bound."""

    def __init__(self, pipe, mesh, style: str = "spatial"):
        self._pipe = pipe
        self._mesh = mesh
        self._style = style
        self.models = pipe.models

    def generate(self, prompts, layouts, relation_texts=None, seed=42,
                 seeds=None, **cond_kwargs):
        return self._pipe.generate_tp(
            self._mesh, prompts, layouts, relation_texts=relation_texts,
            seed=seed, seeds=seeds, style=self._style, **cond_kwargs)


# single source of truth for the preset knobs: pipeline/presets.py
from ..pipeline.presets import apply_fast_preset  # noqa: F401  (re-export)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--host", type=str, default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8501)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--max_delay_ms", type=float, default=80.0)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--sampler", type=str, default="plms",
                    choices=["plms", "ddim", "dpm"],
                    help="dpm = DPM-Solver++(2M): PLMS-50-class quality at "
                         "~20 steps (pair with --steps 20)")
    ap.add_argument("--guidance_scale", type=float, default=7.5)
    ap.add_argument("--no_warmup", action="store_true")
    ap.add_argument("--tp", action="store_true",
                    help="tensor-parallel LATENCY mode: shard each image's "
                         "compute over ALL devices (parallel/tp.py) instead "
                         "of batching for throughput; implies --batch 1 "
                         "unless --batch is given explicitly")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 UNet (ops/quant.py): halves the "
                         "per-step weight HBM reads — the latency-serving "
                         "knob for small batches")
    ap.add_argument("--cache_encoder", type=int, default=0,
                    help="encoder propagation interval (approximate speed "
                         "mode, arXiv:2312.09608; 0/1 = exact)")
    ap.add_argument("--cfg_interval", type=str, default=None,
                    help="LO,HI step fractions where CFG applies "
                         "(arXiv:2404.07724), e.g. 0.1,0.85 (paper-faithful: high-noise steps off)")
    ap.add_argument("--fast", action="store_true",
                    help="serving speed preset: DPM-Solver++ 15 steps + "
                         "guidance interval 0,0.75 + encoder cache 2 "
                         "(explicit --steps/--sampler/--cfg_interval/"
                         "--cache_encoder flags override the preset pieces; "
                         "int8 is excluded — measured as a loss on chip, "
                         "PERF.md round 4). Quality-gate with eval.nss1k "
                         "before production")
    args = ap.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 26-min cold start (PERF.md r5)
    if args.fast:
        apply_fast_preset(args)

    from ..pipeline.inference import InferencePipeline, parse_cfg_interval
    from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models
    from ..serving.server import GenerationServer

    if args.batch is None:
        args.batch = 1 if args.tp else 4
    if args.ckpt:
        models = load_models_from_gligen_ckpt(args.ckpt)
    else:
        models = random_models(small=args.small)
    if args.int8:
        from ..pipeline.loaders import quantize_unet_int8

        models = quantize_unet_int8(models)
    steps = args.steps or (8 if args.small else 50)
    pipe = InferencePipeline(models, steps=steps, sampler=args.sampler,
                             guidance_scale=args.guidance_scale,
                             encoder_cache_interval=args.cache_encoder,
                             cfg_interval=parse_cfg_interval(getattr(args, "cfg_interval", None)))
    if args.tp:
        from ..parallel.tp import tp_mesh

        pipe = TPPipeAdapter(pipe, tp_mesh())
    srv = GenerationServer(pipe, batch_size=args.batch,
                           max_delay_ms=args.max_delay_ms, host=args.host,
                           port=args.port, warmup=not args.no_warmup)
    print(f"serving on {args.host}:{srv.port} (batch={args.batch}, "
          f"steps={steps})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
