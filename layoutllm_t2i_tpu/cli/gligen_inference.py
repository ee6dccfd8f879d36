"""Multi-modality GLIGEN inference CLI (gligen_inference.py equivalent).

Covers the upstream demo paths (reference gligen_inference.py:199-447):
box+text generation (default), box+text inpainting (--inpaint_image + GT
boxes keep-masked), condition-map modalities (--modality canny/hed/depth/
normal/sem with --map_path: ConvNeXt grounding tokens + downsampler extra
input channels), and person keypoints (--modality keypoint --keypoints).
Runs offline with random weights via --small for smoke.

Run: python -m layoutllm_t2i_tpu.cli.gligen_inference \
       --prompt "a dog" --layout "dog:[0.2,0.2,0.5,0.5]" [--ckpt c.pth] \
       [--inpaint_image img.png] [--no_relation] \
       [--modality canny --map_path edge.png] \
       [--modality keypoint --keypoints "0.5,0.2;0.52,0.18;..."]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..pipeline.inference import (
    InferencePipeline, convert_xywh_to_ltrb, images_to_uint8,
    parse_cfg_interval)
from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models
from ..pipeline.planner import extract_prediction
from ..pipeline.inpaint import draw_masks_from_boxes
from ..utils.boxes import draw_boxes_ltrb


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--layout", type=str, default=None,
                   help="'label:[x,y,w,h];...' normalized xywh "
                        "(required for box_text)")
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
    p.add_argument("--modality", default="box_text",
                   choices=["box_text", "text_image", "canny", "hed", "depth",
                            "normal", "sem", "keypoint"])
    p.add_argument("--map_path", type=str, default=None,
                   help="condition-map image for the map modalities")
    p.add_argument("--image_refs", type=str, default=None,
                   help="text_image mode: ';'-separated reference image paths"
                        " paired with the --layout boxes ('-' skips a box)")
    p.add_argument("--clip_vision_ckpt", type=str, default=None,
                   help="converted CLIP .pth for the image-reference tower")
    p.add_argument("--projection_matrix", type=str, default=None,
                   help="the reference's 768x768 'projection_matrix' file "
                        "(interface.py:128) for after_reproject image feats")
    p.add_argument("--keypoints", type=str, default=None,
                   help="'x,y;x,y;...' normalized, 17 per person, persons "
                        "separated by '|'")
    p.add_argument("--small", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 UNet (ops/quant.py)")
    p.add_argument("--cache_encoder", type=int, default=0,
                   help="encoder propagation interval (arXiv:2312.09608)")
    p.add_argument("--cfg_interval", type=str, default=None,
                   help="LO,HI step fractions where CFG applies "
                        "(arXiv:2404.07724), e.g. 0.1,0.85 (paper-faithful: high-noise steps off)")
    return p.parse_args(argv)


def _parse_keypoints(spec: str, max_persons: int):
    """'x,y;...|x,y;...' -> points (P*17, 2), masks (P*17,)."""
    points = np.zeros((max_persons * 17, 2), np.float32)
    masks = np.zeros((max_persons * 17,), np.float32)
    for pi, person in enumerate(spec.split("|")[:max_persons]):
        for ki, xy in enumerate(person.split(";")[:17]):
            try:
                x, y = (float(v) for v in xy.split(","))
            except ValueError:
                raise SystemExit(
                    f"--keypoints: cannot parse '{xy}' — expected 'x,y' pairs "
                    "separated by ';' (17 per person, persons by '|')")
            points[pi * 17 + ki] = [x, y]
            masks[pi * 17 + ki] = 1.0
    return points, masks


def _image_ref_grounding(args, models, cond):
    """text_image mode: per-box CLIP image embeddings from reference images
    (reference gligen_inference.py builds these via get_clip_feature; TSV
    training data stores them 'after_reproject' at norm 28.7,
    tsv_dataset.py:193)."""
    from PIL import Image

    from ..models.clip_vision import (
        CLIPVisionConfig, clip_image_features, init_clip_vision_params,
        preprocess_images)

    if args.clip_vision_ckpt:
        import torch

        from ..checkpoint.convert import nest_state_dict

        tree = nest_state_dict(torch.load(args.clip_vision_ckpt,
                                          map_location="cpu",
                                          weights_only=False))
        vision_cfg = CLIPVisionConfig()
        vision_params = {"vision_model": tree["vision_model"],
                         "visual_projection": tree["visual_projection"]}
    else:
        vision_cfg = (CLIPVisionConfig(num_layers=2, hidden_size=64,
                                       num_heads=4, intermediate_size=128,
                                       projection_dim=768)
                      if args.small else CLIPVisionConfig())
        vision_params = init_clip_vision_params(jax.random.PRNGKey(args.seed),
                                                vision_cfg)

    proj = None
    if args.projection_matrix:
        import torch

        proj = np.asarray(torch.load(args.projection_matrix,
                                     map_location="cpu",
                                     weights_only=False).float().numpy())

    refs = args.image_refs.split(";")
    mo = cond["boxes"].shape[1]
    emb = np.zeros((args.batch_size, mo, 768), np.float32)
    image_masks = np.zeros((args.batch_size, mo), np.float32)
    for bi, ref in enumerate(refs):
        if ref == "-":
            continue
        img = Image.open(ref).convert("RGB")
        x = np.asarray(img, np.float32)[None] / 255.0
        feat = clip_image_features(vision_params, vision_cfg,
                                   preprocess_images(jnp.asarray(x), vision_cfg))
        feat = np.asarray(feat)[0]
        if proj is not None:
            from ..data.tsv import reproject_embedding

            feat = reproject_embedding(feat[None], proj)[0]
        else:
            feat = feat / max(np.linalg.norm(feat), 1e-6) * 28.7  # after_reproject
        emb[:, bi] = feat
        image_masks[:, bi] = 1.0
    return {
        "text_masks": cond["masks"],
        "image_masks": jnp.asarray(image_masks),
        "image_embeddings": jnp.asarray(emb),
    }


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 26-min cold start (PERF.md r5)
    box_mode = args.modality in ("box_text", "text_image")
    # validate modality inputs up front — model construction takes minutes
    if box_mode:
        assert args.layout, f"--layout is required for {args.modality}"
        cats, boxes_xywh = extract_prediction(args.layout)
        boxes_ltrb = [convert_xywh_to_ltrb(b) for b in boxes_xywh]
        if args.modality == "text_image":
            assert args.image_refs, "--image_refs is required for text_image"
            refs = args.image_refs.split(";")
            assert len(refs) == len(boxes_ltrb), (
                f"--image_refs has {len(refs)} entries for {len(boxes_ltrb)} "
                "boxes ('-' skips a box)")
    else:
        cats, boxes_ltrb = [], []
        if args.modality == "keypoint":
            assert args.keypoints, "--keypoints is required for keypoint"
            _parse_keypoints(args.keypoints, 8)  # fail fast on malformed input
        else:
            assert args.map_path, f"--map_path is required for {args.modality}"

    if args.ckpt:
        models = load_models_from_gligen_ckpt(args.ckpt)
    else:
        models = random_models(small=args.small)
    if args.no_relation:
        import dataclasses

        models.unet_cfg = dataclasses.replace(models.unet_cfg,
                                              use_relation_attention=False)
    if args.modality != "box_text":
        from ..pipeline.loaders import adapt_models_for_modality

        models = adapt_models_for_modality(models, args.modality,
                                           seed=args.seed)
        if not box_mode:
            # grounding stays on for all steps: the SD first-conv restore
            # cannot apply over the extra downsampler channels
            args.alpha = [1.0, 0.0, 0.0]

    steps = 250 if args.no_plms else 50
    if args.small:
        steps = min(steps, 8)
    if args.int8:
        from ..pipeline.loaders import quantize_unet_int8

        models = quantize_unet_int8(models)
    pipe = InferencePipeline(models, steps=steps,
                             sampler="ddim" if args.no_plms else "plms",
                             guidance_scale=args.guidance_scale,
                             alpha_type=tuple(args.alpha),
                             encoder_cache_interval=args.cache_encoder,
                             cfg_interval=parse_cfg_interval(getattr(args, "cfg_interval", None)))

    prompts = [args.prompt] * args.batch_size
    layouts = [(boxes_ltrb, cats)] * args.batch_size
    rel = None
    if not args.no_relation and box_mode:
        from ..pipeline.scene_graph import relation_texts_for_inference

        rel = [relation_texts_for_inference(args.prompt, models.max_relas)] * args.batch_size

    cond = pipe.build_cond(prompts, layouts, rel)
    if args.negative_prompt:
        cond["uc_context"] = pipe.encode_text([args.negative_prompt] * args.batch_size)

    if args.modality == "text_image":
        cond["extra_grounding"] = _image_ref_grounding(args, models, cond)
    elif args.modality in ("canny", "hed", "depth", "normal", "sem"):
        from PIL import Image

        from ..models.grounding_extras import grounding_downsampler

        assert args.map_path, f"--map_path is required for {args.modality}"
        m_img = Image.open(args.map_path).convert("RGB")
        cmap = np.asarray(m_img, np.float32)[None] / 255.0
        cmap = jnp.asarray(np.tile(cmap, (args.batch_size, 1, 1, 1)))
        cond["extra_grounding"] = {
            "cond_map": cmap,
            "map_mask": jnp.ones((args.batch_size,), jnp.float32),
        }
        # extra UNet input channels, computed once outside the sampling scan
        # (the reference recomputes downsample_net per step, openaimodel.py:433)
        extra = grounding_downsampler(
            models.unet_params["downsample_net"], cmap,
            resize_input=4 * models.unet_cfg.image_size)
        cond["grounding_extra"] = extra.astype(jnp.float32)
    elif args.modality == "keypoint":
        assert args.keypoints, "--keypoints is required for keypoint"
        pts, masks = _parse_keypoints(args.keypoints,
                                      models.unet_cfg.max_persons_per_image)
        cond["boxes"] = jnp.tile(jnp.asarray(pts)[None], (args.batch_size, 1, 1))
        cond["masks"] = jnp.tile(jnp.asarray(masks)[None], (args.batch_size, 1))
        cond["phrase_embeddings"] = jnp.zeros(
            (args.batch_size, pts.shape[0], models.unet_cfg.grounding_in_dim),
            jnp.float32)

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
