"""Generation CLI with reference txt2img.py flag parity.

prompt -> policy example selection -> LLM layout (or --layout_cache JSON /
--layout 'obj:[x,y,w,h];...' for offline runs) -> relation-aware diffusion
-> 512px images with box overlays.

Run: python -m layoutllm_t2i_tpu.cli.txt2img --prompt "..." --cand_path ... \
     --diff_ckpt_path ckpt.pth [--policy_ckpt_path p.pt] [--num_per_prompt 5]
"""
from __future__ import annotations

import argparse
import os
import re

import numpy as np
import jax

from ..data.rl_data import load_json
from ..models.policy import init_policy_params
from ..pipeline.inference import (
    InferencePipeline, convert_xywh_to_ltrb, images_to_uint8,
    parse_cfg_interval)
from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models
from ..pipeline.planner import (
    CachedLayoutLLM, LLMClient, build_prompt, extract_prediction, select_topk_shots,
)
from ..pipeline.scene_graph import relation_texts_for_inference
from ..utils.boxes import draw_boxes_ltrb


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, default="generation_samples")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_per_prompt", type=int, default=5)
    p.add_argument("--no_plms", action="store_true", help="use DDIM-250 instead")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["plms", "ddim", "dpm"],
                   help="override the sampler (dpm = DPM-Solver++(2M), "
                        "pair with --sample_steps)")
    p.add_argument("--sample_steps", type=int, default=None,
                   help="override the step count (e.g. 20 with --sampler dpm)")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--in_dim", type=int, default=768)
    p.add_argument("--embedding_size", type=int, default=128)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--cand_path", type=str, default=None)
    p.add_argument("--policy_ckpt_path", type=str, default=None)
    p.add_argument("--diff_ckpt_path", type=str, default=None,
                   help="GLIGEN .pth; omit for random weights (smoke)")
    p.add_argument("--sd_conv_path", type=str, default=None)
    p.add_argument("--shot_number", type=int, default=2)
    # LLM settings (engine flags mirror train_rl.py)
    p.add_argument("--engine", type=str, default="gpt-3.5-turbo")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max_tokens", type=int, default=512)
    p.add_argument("--presence_penalty", type=float, default=0.0)
    p.add_argument("--frequency_penalty", type=float, default=0.0)
    # offline modes
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="full CLIPModel .pth for policy text features "
                        "(projected get_text_features, exact reference parity); "
                        "falls back to the pipeline text encoder's pooled output")
    p.add_argument("--layout_cache", type=str, default=None,
                   help="JSON caption->layout cache; replaces the LLM call")
    p.add_argument("--layout", type=str, default=None,
                   help="explicit layout 'label:[x,y,w,h];label:[...]' (xywh)")
    p.add_argument("--small", action="store_true", help="tiny random models (CI smoke)")
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 UNet (ops/quant.py) — latency-"
                        "oriented; see bench.py --int8")
    p.add_argument("--cache_encoder", type=int, default=0,
                   help="encoder propagation interval (approximate speed "
                        "mode, arXiv:2312.09608; 0/1 = exact)")
    p.add_argument("--cfg_interval", type=str, default=None,
                   help="LO,HI step fractions where CFG applies "
                        "(arXiv:2404.07724), e.g. 0.1,0.85 (paper-faithful: high-noise steps off)")
    return p.parse_args(argv)


def plan_layout(args):
    """Returns (categories, boxes_xywh)."""
    if args.layout:
        cats, boxes = extract_prediction(args.layout)
        return cats, boxes

    raw_cand = load_json(args.cand_path)
    cand_examples = raw_cand["data"]

    if args.layout_cache:
        llm = CachedLayoutLLM(args.layout_cache)
    else:
        llm = LLMClient(engine=args.engine, temperature=args.temperature,
                        max_tokens=args.max_tokens,
                        presence_penalty=args.presence_penalty,
                        frequency_penalty=args.frequency_penalty)

    # policy scoring over candidate captions needs CLIP text features; with a
    # converted CLIPModel this uses get_text_features — for the common case we
    # score with the policy over pooled features from the pipeline encoder.
    shots = list(range(min(args.shot_number, len(cand_examples))))[::-1]
    if args.policy_ckpt_path and os.path.exists(args.policy_ckpt_path):
        import pickle

        from ..models.policy import policy_scores
        from ..checkpoint.convert import load_torch_linear

        if args.policy_ckpt_path.endswith((".pt", ".pth")):
            linear = load_torch_linear(args.policy_ckpt_path)
            params = {"linear": linear}
        else:
            with open(args.policy_ckpt_path, "rb") as f:
                params = pickle.load(f)
        feats = _caption_features([args.prompt] + [ex["captions"] for ex in cand_examples],
                                  args)
        scores = np.asarray(policy_scores(params, feats[:1], feats[1:]))[0]
        shots = select_topk_shots(scores, args.shot_number)

    shot_cand = [cand_examples[c] for c in shots]
    prompt = build_prompt(shot_cand, args.prompt)
    output = llm(prompt)
    return extract_prediction(output)


def _caption_features(texts, args):
    """CLIP text features for policy scoring. With --clip_ckpt this is the
    projected get_text_features (reference txt2img.py:454-457); otherwise the
    pipeline text encoder's pooled output (same dim, unprojected)."""
    if getattr(args, "clip_ckpt", None):
        import jax.numpy as jnp
        import torch

        from ..checkpoint.convert import nest_state_dict
        from ..models.clip_text import CLIPTextConfig, clip_text_features

        sd = torch.load(args.clip_ckpt, map_location="cpu", weights_only=False)
        tree = nest_state_dict(sd)
        params = dict(tree["text_model"])
        params["text_projection"] = tree["text_projection"]
        pipe = _get_pipe(args)
        ids = pipe.models.tokenizer(texts)
        return np.asarray(clip_text_features(params, CLIPTextConfig(), jnp.asarray(ids)))
    pipe = _get_pipe(args)
    return np.asarray(pipe.encode_pooled(texts))


_PIPE = None


def _get_pipe(args) -> InferencePipeline:
    global _PIPE
    if _PIPE is None:
        if args.diff_ckpt_path:
            models = load_models_from_gligen_ckpt(args.diff_ckpt_path, args.sd_conv_path)
        else:
            models = random_models(small=args.small)
        if getattr(args, "int8", False):
            from ..pipeline.loaders import quantize_unet_int8

            models = quantize_unet_int8(models)
        steps = 250 if args.no_plms else 50
        sampler = "ddim" if args.no_plms else "plms"
        if getattr(args, "sampler", None):
            sampler = args.sampler
        if getattr(args, "sample_steps", None):
            steps = args.sample_steps
        _PIPE = InferencePipeline(models, steps=steps, sampler=sampler,
                                  guidance_scale=args.guidance_scale,
                                  alpha_type=(0.3, 0.0, 0.7),
                                  encoder_cache_interval=getattr(
                                      args, "cache_encoder", 0),
                                  cfg_interval=parse_cfg_interval(getattr(args, "cfg_interval", None)))
    return _PIPE


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 26-min cold start (PERF.md r5)
    np.random.seed(args.seed)

    categories, boxes_xywh = plan_layout(args)
    boxes_ltrb = [convert_xywh_to_ltrb(b) for b in boxes_xywh]
    print(f"layout: {list(zip(categories, [list(map(lambda v: round(v,2), b)) for b in boxes_ltrb]))}")

    pipe = _get_pipe(args)
    rel = relation_texts_for_inference(args.prompt, pipe.models.max_relas)

    os.makedirs(args.folder, exist_ok=True)
    safe = re.sub(r"[^\w\s-]", "", args.prompt)[:100]

    import jax

    n_dev = jax.device_count()
    total = args.num_per_prompt * args.batch_size
    if n_dev > 1 and total % n_dev == 0:
        # shard the generation sweep over the device mesh (num_per_prompt is
        # the reference's DP axis, SURVEY.md §7)
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        imgs = pipe.generate_sharded(
            mesh, [args.prompt] * total, [(boxes_ltrb, categories)] * total,
            relation_texts=[rel] * total, seed=args.seed,
        )
        for j, img in enumerate(images_to_uint8(imgs)):
            sample = draw_boxes_ltrb(img, boxes_ltrb, categories)
            path = os.path.join(args.folder, f"{safe}_{j}.jpg")
            sample.save(path)
            print(f"saved {path}")
        return

    for i in range(args.num_per_prompt):
        imgs = pipe.generate(
            [args.prompt] * args.batch_size,
            [(boxes_ltrb, categories)] * args.batch_size,
            relation_texts=[rel] * args.batch_size,
            seed=args.seed + i,
        )
        for j, img in enumerate(images_to_uint8(imgs)):
            sample = draw_boxes_ltrb(img, boxes_ltrb, categories)
            path = os.path.join(args.folder, f"{safe}_{i * args.batch_size + j}.jpg")
            sample.save(path)
            print(f"saved {path}")


if __name__ == "__main__":
    main()
