"""REINFORCE policy-training CLI with train_rl.py flag parity.

Run: python -m layoutllm_t2i_tpu.cli.train_rl --img_dir .../train2014 \
       --diff_ckpt ckpt.pth --aesthetic_ckpt aes.pth \
       [--layout_cache layouts.json for offline runs]
"""
from __future__ import annotations

import argparse
import json
import os
from datetime import datetime

import numpy as np
import jax

from ..data.rl_data import RLBatches, load_rl_data
from ..training.rl_trainer import RLConfig, RLTrainer
from ..utils.logging import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, default="exp0")
    p.add_argument("--shot_number", type=int, default=2)
    p.add_argument("--seed", type=int, default=53)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--img_dir", type=str, required=True)
    p.add_argument("--sampled_data_dir", type=str, default="./data")
    p.add_argument("--train_number", type=int, default=64)
    p.add_argument("--cand_number", type=int, default=32)
    p.add_argument("--engine", type=str, default="gpt-3.5-turbo")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max_tokens", type=int, default=512)
    p.add_argument("--frequency_penalty", type=float, default=0.0)
    p.add_argument("--presence_penalty", type=float, default=0.0)
    p.add_argument("--model_config", type=str, default="openai/clip-vit-large-patch14")
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lr_step_size", type=int, default=20)
    p.add_argument("--lr_gamma", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--embedding_size", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--policy_temperature", type=float, default=1.0)
    p.add_argument("--diff_ckpt", type=str, default=None)
    p.add_argument("--ckpt_root", type=str, default="./checkpoints")
    p.add_argument("--aesthetic_ckpt", type=str, default=None)
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="converted full CLIPModel .pth for the reward towers")
    p.add_argument("--layout_cache", type=str, default=None)
    p.add_argument("--small", action="store_true", help="tiny random models (smoke)")
    # rollout sampler config: the reference hardwires PLMS-50
    # (interface.py:313-320); the REINFORCE reward only needs a decodable
    # image per rollout, so the measured --fast preset (dpm20 + cfg-interval
    # + enc-cache, PERF.md r4) makes on-chip RL ~3.3x cheaper per epoch
    p.add_argument("--sampler", type=str, default="plms",
                   choices=["plms", "ddim", "dpm"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--cfg_interval", type=str, default=None)
    p.add_argument("--cache_encoder", type=int, default=0)
    p.add_argument("--fast", action="store_true",
                   help="rollout with the measured serving fast preset")
    return p.parse_args(argv)


def build_reward(args):
    from ..models.clip_text import CLIPTextConfig, init_clip_text_params
    from ..models.clip_vision import CLIPVisionConfig, init_clip_vision_params
    from ..models.clip_tokenizer import default_tokenizer
    from ..models.initializers import linear_p
    from ..models.policy import init_aesthetic_params
    from ..pipeline.reward import RewardModel

    if args.small:
        text_cfg = CLIPTextConfig(num_layers=2)
        vision_cfg = CLIPVisionConfig(num_layers=2, hidden_size=64, num_heads=4,
                                      intermediate_size=128, projection_dim=768)
    else:
        text_cfg, vision_cfg = CLIPTextConfig(), CLIPVisionConfig()

    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    text_params = init_clip_text_params(k1, text_cfg)
    text_params["text_projection"] = linear_p(k4, text_cfg.hidden_size, 768, bias=False)
    vision_params = init_clip_vision_params(k2, vision_cfg)
    aes = init_aesthetic_params(k3)

    if args.clip_ckpt:
        from ..checkpoint.convert import nest_state_dict
        import torch

        sd = torch.load(args.clip_ckpt, map_location="cpu", weights_only=False)
        tree = nest_state_dict(sd)
        text_params = dict(tree["text_model"])
        text_params["text_projection"] = tree["text_projection"]
        vision_params = {"vision_model": tree["vision_model"],
                         "visual_projection": tree["visual_projection"]}
    if args.aesthetic_ckpt:
        from ..checkpoint.convert import nest_state_dict
        import torch

        aes = nest_state_dict(torch.load(args.aesthetic_ckpt, map_location="cpu",
                                         weights_only=False))

    return RewardModel(text_cfg, text_params, vision_cfg, vision_params, aes,
                       default_tokenizer())


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 26-min cold start (PERF.md r5)
    args.exp = args.exp + datetime.now().strftime("_%Y_%m_%d_%H_%M_%S")
    ckpt_path = os.path.join(args.ckpt_root, args.exp)
    os.makedirs(ckpt_path, exist_ok=True)
    logger = Logger(os.path.join(ckpt_path, "log.txt"))
    logger.write(json.dumps(vars(args), indent=2))

    reward_model = build_reward(args)

    # frozen diffusion pipeline
    from ..pipeline.inference import InferencePipeline, convert_xywh_to_ltrb
    from ..pipeline.loaders import load_models_from_gligen_ckpt, random_models
    from ..pipeline.scene_graph import relation_texts_for_inference

    if args.diff_ckpt:
        models = load_models_from_gligen_ckpt(args.diff_ckpt)
    else:
        models = random_models(small=args.small)
    if args.fast:
        from .serve import apply_fast_preset

        apply_fast_preset(args)
    from ..pipeline.inference import parse_cfg_interval

    pipe = InferencePipeline(
        models, steps=args.steps or 50, sampler=args.sampler,
        guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
        encoder_cache_interval=args.cache_encoder or None,
        cfg_interval=parse_cfg_interval(args.cfg_interval))

    def generate_fn(captions, layouts, seed=None):
        lay = [([convert_xywh_to_ltrb(b) for b in boxes], labels)
               for boxes, labels in layouts]
        rel = [relation_texts_for_inference(c, models.max_relas) for c in captions]
        # the trainer passes a fresh seed per rollout batch (reference draws
        # fresh noise per sample, interface.py:478-551)
        return pipe.generate(captions, lay, relation_texts=rel,
                             seed=args.seed if seed is None else seed)

    # LLM
    if args.layout_cache:
        from ..pipeline.planner import CachedLayoutLLM

        llm = CachedLayoutLLM(args.layout_cache)
    else:
        from ..pipeline.planner import LLMClient

        llm = LLMClient(engine=args.engine, temperature=args.temperature,
                        max_tokens=args.max_tokens,
                        presence_penalty=args.presence_penalty,
                        frequency_penalty=args.frequency_penalty,
                        logger=Logger(os.path.join(ckpt_path, "gpt_log.txt")))

    # data + caption features
    train_examples, cand_examples, _, _ = load_rl_data(
        args.sampled_data_dir, args.train_number, args.cand_number
    )
    feats_train = np.asarray(reward_model.text_features([d["captions"] for d in train_examples]))
    feats_cand = np.asarray(reward_model.text_features([d["captions"] for d in cand_examples]))
    batches = RLBatches(train_examples, args.img_dir, args.batch_size)

    cfg = RLConfig(
        epochs=args.epochs, batch_size=args.batch_size, shot_number=args.shot_number,
        lr=args.lr, lr_step_size=args.lr_step_size, lr_gamma=args.lr_gamma,
        policy_temperature=args.policy_temperature,
        embedding_size=args.embedding_size, seed=args.seed,
        ckpt_path=ckpt_path, resume=args.resume,
    )
    RLTrainer(cfg, reward_model, generate_fn, llm, train_examples, cand_examples,
              feats_train, feats_cand, batches, logger=logger).train()


if __name__ == "__main__":
    main()
