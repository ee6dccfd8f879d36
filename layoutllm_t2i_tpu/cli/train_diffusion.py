"""Relation-aware diffusion training CLI (GLIGEN/main.py equivalent).

Run: python -m layoutllm_t2i_tpu.cli.train_diffusion --name exp \
       [--ckpt_path gligen.pth] [--coco_root /data/coco] [--synthetic]

Multi-chip: works unchanged over all local devices via the data mesh; for
multi-host add jax.distributed.initialize() via --multihost.
"""
from __future__ import annotations

import argparse

from ..training.diffusion_trainer import DiffusionTrainer, TrainerConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", type=str, default="relation_training")
    p.add_argument("--output_root", type=str, default="OUTPUT")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--total_iters", type=int, default=500_000)
    p.add_argument("--save_every_iters", type=int, default=5000)
    p.add_argument("--base_learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=10_000)
    p.add_argument("--scheduler_type", type=str, default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--trainable_mode", type=str, default="rela_fuse",
                   choices=["rela_fuse", "gligen", "all"])
    p.add_argument("--optimizer", type=str, default="adamw",
                   choices=["adamw", "sgd"],
                   help="sgd keeps zero optimizer state — required for "
                        "--trainable_mode all on one 16 GB chip (AdamW's "
                        "f32 moments for the 860M-param UNet OOM; use "
                        "--zero1 + a mesh for multi-chip Adam finetunes)")
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--coco_root", type=str, default=None)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--max_boxes", type=int, default=30)
    p.add_argument("--max_relations", type=int, default=10)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--synthetic", action="store_true",
                   help="random data (smoke/benchmark runs)")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--enable_previews", action="store_true",
                   help="PLMS sample grid at every save "
                        "(trainer_combined_layout.py:457-521)")
    p.add_argument("--preview_steps", type=int, default=50)
    p.add_argument("--export_reference_ckpt", action="store_true",
                   help="also write the reference 4-module .pth at every save")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 compute with f32 master weights")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation microbatches per step "
                        "(batch_size is the effective batch)")
    p.add_argument("--enable_ema", action="store_true",
                   help="EMA of trainable params (reference enable_ema)")
    p.add_argument("--ema_rate", type=float, default=0.9999)
    p.add_argument("--sync_ckpt", action="store_true",
                   help="write checkpoints synchronously (default: disk "
                        "writes overlap training via checkpoint/async_io)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard Adam moments over the data mesh axis "
                        "(for --trainable_mode all full finetunes)")
    p.add_argument("--small", action="store_true",
                   help="tiny random models (CPU smoke)")
    return p.parse_args(argv)


def _small_models():
    import jax

    from ..models.clip_text import CLIPTextConfig, init_clip_text_params
    from ..models.clip_tokenizer import HashTokenizer
    from ..models.unet import UNetConfig, init_unet_params
    from ..models.vae import VAEConfig, init_vae_params
    from ..ops.schedules import make_ddpm_schedule

    unet_cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                          attention_resolutions=(2, 1), channel_mult=(1, 2),
                          num_heads=2, context_dim=32, grounding_in_dim=32,
                          grounding_out_dim=32)
    vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    clip_cfg = CLIPTextConfig(num_layers=1, hidden_size=32, num_heads=2,
                              intermediate_size=64, vocab_size=512)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return dict(
        unet_cfg=unet_cfg, unet_params=init_unet_params(k1, unet_cfg),
        vae_cfg=vae_cfg, vae_params=init_vae_params(k2, vae_cfg),
        clip_cfg=clip_cfg, clip_params=init_clip_text_params(k3, clip_cfg),
        schedule=make_ddpm_schedule("linear", 1000, 0.00085, 0.012),
        tokenizer=HashTokenizer(max_length=8, vocab_size=512),
    )


def main(argv=None):
    args = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 26-min cold start (PERF.md r5)
    if args.multihost:
        import jax

        jax.distributed.initialize()

    cfg = TrainerConfig(
        output_root=args.output_root, name=args.name, batch_size=args.batch_size,
        total_iters=args.total_iters, save_every_iters=args.save_every_iters,
        base_learning_rate=args.base_learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, scheduler_type=args.scheduler_type,
        trainable_mode=args.trainable_mode, optimizer=args.optimizer,
        max_boxes=args.max_boxes,
        max_relations=args.max_relations, seed=args.seed, ckpt_path=args.ckpt_path,
        disable_inference_in_training=not args.enable_previews,
        preview_steps=args.preview_steps,
        export_reference_ckpt=args.export_reference_ckpt,
        mixed_precision=args.mixed_precision,
        enable_ema=args.enable_ema, ema_rate=args.ema_rate,
        accum_steps=args.accum_steps,
        zero1_opt_state=args.zero1,
        async_ckpt=not args.sync_ckpt,
    )

    models = _small_models() if args.small else None
    if args.small:
        args.image_size = 16  # f2 VAE: latent 8 matches the small UNet

    if args.synthetic or not args.coco_root:
        from ..data.synthetic import synthetic_layout_batches

        dataset = synthetic_layout_batches(cfg.batch_size, args.image_size,
                                           cfg.max_boxes)
    else:
        from ..data.coco import coco_layout_batches

        dataset = coco_layout_batches(args.coco_root, cfg.batch_size,
                                      args.image_size, cfg.max_boxes)

    DiffusionTrainer(cfg, dataset, models=models).train()


if __name__ == "__main__":
    main()
