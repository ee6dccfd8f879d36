"""Relation-aware diffusion trainer (the trainer_combined_layout.py rebuild).

Structure:
  * model assembly from a converted GLIGEN checkpoint (or random init for
    smoke runs); VAE + text encoder frozen, UNet trained under a mode mask
    ('rela_fuse' for LayoutLLM-T2I, 'gligen' for fuser+position_net);
  * a jitted encode step (VAE encode + CLIP text/caption/phrase/relations) and
    the jitted train step over a 1-D data mesh — batch sharded, params
    replicated, gradient all-reduce inserted by XLA;
  * checkpoint save with embedded config + tagNN auto-resume
    (trainer_combined_layout.py:147-176, 457-535), JSONL metrics + optional
    TensorBoard, periodic PLMS-50 sample previews.
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..checkpoint.async_io import AsyncWriter
from ..checkpoint.io import (
    create_run_dir_with_auto_resume, load_checkpoint, save_checkpoint,
)
from ..models.clip_text import CLIPTextConfig, clip_text_apply, init_clip_text_params
from ..models.clip_tokenizer import default_tokenizer
from ..models.unet import UNetConfig, init_unet_params
from ..models.vae import VAEConfig, encode as vae_encode, init_vae_params
from ..ops.schedules import DDPMSchedule, make_ddpm_schedule
from ..parallel.mesh import (
    batch_sharding, is_primary, make_mesh, replicated, zero1_sharding,
)
from ..pipeline.scene_graph import relation_texts_for_training
from ..utils.logging import Logger, MetricsWriter, maybe_tensorboard
from .train_step import (
    TrainStepConfig, TrainState, init_partitioned_state,
    make_partitioned_train_step,
)


@dataclasses.dataclass
class TrainerConfig:
    output_root: str = "OUTPUT"
    name: str = "relation_training"
    batch_size: int = 8               # global batch
    total_iters: int = 500_000
    save_every_iters: int = 5000
    log_every: int = 10
    base_learning_rate: float = 5e-5
    weight_decay: float = 0.0
    warmup_steps: int = 10_000
    scheduler_type: str = "constant"
    trainable_mode: str = "rela_fuse"
    optimizer: str = "adamw"  # sgd = zero opt state (single-chip 'all' mode)
    max_boxes: int = 30
    max_relations: int = 10
    seed: int = 123
    ckpt_path: Optional[str] = None   # converted GLIGEN ckpt (.pth) to start from
    # periodic PLMS sample grid on a training batch at every save
    # (trainer_combined_layout.py:457-521); off by default like the reference
    # flag of the same name
    disable_inference_in_training: bool = True
    preview_steps: int = 50
    preview_guidance: float = 5.0
    # additionally write the reference 4-module dict .pth at every save so
    # reference tooling can consume trained weights (checkpoint/export.py)
    export_reference_ckpt: bool = False
    # bf16 compute / f32 master weights in the train step (reference is fp32)
    mixed_precision: bool = False
    # EMA of the trainable params (reference enable_ema/ema_rate,
    # trainer_combined_layout.py:266-270,438-439; off by default there too).
    # The EMA tree is saved in the native checkpoint and as the reference
    # trainer's optional "ema" entry in exported .pth files (:533-534).
    enable_ema: bool = False
    ema_rate: float = 0.9999
    # gradient accumulation: scan accum_steps microbatches inside the jitted
    # step, one optimizer/EMA update (train_step.py). batch_size is the
    # EFFECTIVE batch; peak activation memory follows batch_size/accum_steps.
    accum_steps: int = 1
    # ZeRO-1: shard the Adam moments over the data axis (parallel/mesh.py
    # zero1_sharding). Matters for trainable_mode='all' full finetunes, where
    # replicated f32 moments are ~10 GB/chip; partial finetunes carry tiny
    # moment trees and gain nothing. Single-host scope (the initial
    # device_put of a sharded state assumes all shards are addressable).
    zero1_opt_state: bool = False
    # overlap checkpoint disk writes with training (checkpoint/async_io.py):
    # the device->host snapshot stays synchronous (the donated next step
    # invalidates the old buffers), the serialize+write — ~5.9 GB/save with
    # export_reference_ckpt at SD scale — rides a background thread. The
    # reference saves synchronously (trainer_combined_layout.py:523-535).
    async_ckpt: bool = True
    num_devices: Optional[int] = None


class DiffusionTrainer:
    def __init__(self, config: TrainerConfig, dataset, models=None):
        """dataset: iterator of host batches with keys
        image (B,512,512,3 in [-1,1]), caption (list[str]),
        boxes (B,MO,4 xyxy), masks (B,MO), labels (list[list[str]]).

        models: optional pre-built dict {unet_cfg, unet_params, vae_cfg,
        vae_params, clip_cfg, clip_params, schedule, tokenizer} — otherwise
        loaded from config.ckpt_path or randomly initialized."""
        self.config = config
        self.dataset = dataset
        n_dev = config.num_devices
        if n_dev is None:
            # largest device count that divides the global batch
            avail = jax.device_count()
            n_dev = max(d for d in range(1, avail + 1) if config.batch_size % d == 0)
        self.mesh = make_mesh(n_dev)
        self.run_dir, resume_ckpt = create_run_dir_with_auto_resume(
            config.output_root, config.name
        )
        self.logger = Logger(os.path.join(self.run_dir, "log.txt"))
        self.metrics = MetricsWriter(os.path.join(self.run_dir, "metrics.jsonl"))
        self.ckpt_writer = AsyncWriter()
        self.tb = maybe_tensorboard(self.run_dir) if is_primary() else None

        m = models or self._build_models(config)
        self.unet_cfg: UNetConfig = m["unet_cfg"]
        self.vae_cfg: VAEConfig = m["vae_cfg"]
        self.clip_cfg: CLIPTextConfig = m["clip_cfg"]
        self.vae_params = m["vae_params"]
        self.clip_params = m["clip_params"]
        self.schedule: DDPMSchedule = m["schedule"]
        self.tokenizer = m["tokenizer"]

        self.step_cfg = TrainStepConfig(
            unet_cfg=self.unet_cfg,
            schedule=self.schedule,
            trainable_mode=config.trainable_mode,
            optimizer=config.optimizer,
            learning_rate=config.base_learning_rate,
            weight_decay=config.weight_decay,
            warmup_steps=config.warmup_steps,
            total_steps=config.total_iters,
            lr_schedule=config.scheduler_type,
            mixed_precision=config.mixed_precision,
            ema_rate=config.ema_rate if config.enable_ema else None,
            accum_steps=config.accum_steps,
        )
        if config.batch_size % config.accum_steps != 0:
            raise ValueError(
                f"batch_size {config.batch_size} must divide into "
                f"accum_steps {config.accum_steps} microbatches")
        # partitioned state: only the trainable subtree (rela_fuse / fuser+
        # position_net) lives in the donated optimizer state; the frozen bulk
        # of the UNet is a read-only input
        self.state, self.frozen_params = init_partitioned_state(
            self.step_cfg, m["unet_params"]
        )
        self.starting_iter = 0
        if resume_ckpt is not None:
            loaded, _ = load_checkpoint(resume_ckpt)
            self.state = TrainState(*loaded["state"]) if isinstance(loaded, dict) else loaded
            self.starting_iter = int(self.state.step)
            self.logger.write(f"auto-resumed from {resume_ckpt} at iter {self.starting_iter}")
            # EMA newly enabled against a pre-EMA checkpoint: seed from params
            if self.step_cfg.ema_rate is not None and self.state.ema_params is None:
                self.state = self.state._replace(
                    params=self.state.params,
                    ema_params=jax.tree.map(lambda x: x, self.state.params))

        repl = replicated(self.mesh)
        data = batch_sharding(self.mesh)
        if config.zero1_opt_state:
            state_sh = TrainState(
                params=jax.tree.map(lambda _: repl, self.state.params),
                opt_state=zero1_sharding(self.mesh, self.state.opt_state),
                step=repl,
                ema_params=(zero1_sharding(self.mesh, self.state.ema_params)
                            if self.state.ema_params is not None else None),
            )
        else:
            state_sh = jax.tree.map(lambda _: repl, self.state)
        self._state_shardings = state_sh
        self.state = jax.tree.map(jax.device_put, self.state, state_sh)
        self.frozen_params = jax.tree.map(
            lambda x: jax.device_put(x, repl), self.frozen_params
        )
        # commit the frozen VAE/CLIP stacks once too: encode runs every iter
        # and ckpt-loaded params would otherwise re-transfer per call
        self.vae_params = jax.tree.map(lambda x: jax.device_put(x, repl),
                                       self.vae_params)
        self.clip_params = jax.tree.map(lambda x: jax.device_put(x, repl),
                                        self.clip_params)
        self._data_sharding = data
        self._train_step = jax.jit(
            make_partitioned_train_step(self.step_cfg),
            in_shardings=(state_sh, repl, data, repl),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
        )
        self._encode = jax.jit(self._encode_fn)
        self._encode_pooled = jax.jit(self._encode_pooled_fn)
        self._preview_pipe = None
        self.rng = jax.random.PRNGKey(config.seed)

    # -- model assembly -----------------------------------------------------

    @staticmethod
    def _build_models(config: TrainerConfig):
        unet_cfg, vae_cfg, clip_cfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
        schedule = make_ddpm_schedule("linear", 1000, 0.00085, 0.012)
        if config.ckpt_path:
            from ..checkpoint.convert import load_gligen_checkpoint

            params, _, _ = load_gligen_checkpoint(config.ckpt_path)
            unet_params = params["unet"]
            vae_params = params["vae"]
            clip_params = params["clip_text"]
        else:
            k = jax.random.PRNGKey(0)
            k1, k2, k3 = jax.random.split(k, 3)
            unet_params = init_unet_params(k1, unet_cfg)
            vae_params = init_vae_params(k2, vae_cfg)
            clip_params = init_clip_text_params(k3, clip_cfg)
        return dict(
            unet_cfg=unet_cfg, unet_params=unet_params, vae_cfg=vae_cfg,
            vae_params=vae_params, clip_cfg=clip_cfg, clip_params=clip_params,
            schedule=schedule, tokenizer=default_tokenizer(),
        )

    # -- batch encoding ------------------------------------------------------

    def _encode_fn(self, vae_params, clip_params, images, input_ids, rng):
        # params ride as jit ARGUMENTS: closing over them bakes ~800MB of
        # VAE+CLIP weights into the program as constants, which the remote
        # compiler rejects outright at SD scale (HTTP 413) — invisible at
        # the toy geometry the CPU tests run
        z = vae_encode(vae_params, self.vae_cfg, images, rng=rng, sample=True)
        context, _ = clip_text_apply(clip_params, self.clip_cfg, input_ids)
        return z, context

    def _encode_pooled_fn(self, clip_params, input_ids):
        _, pooled = clip_text_apply(clip_params, self.clip_cfg, input_ids)
        return pooled

    def encode_texts_pooled(self, texts):
        """Pooled CLIP embeddings with the batch padded to a power-of-two
        bucket: flat per-batch label/relation counts are ragged, and jitting
        on the raw count would compile a new program per distinct count
        (minutes each through the remote compiler). Same bucketing as the
        inference path (pipeline/inference.py _encode_bucketed)."""
        if not texts:
            return np.zeros((0, self.clip_cfg.hidden_size), np.float32)
        from ..utils.buckets import pad_rows_pow2

        ids = self.tokenizer(list(texts))
        n = ids.shape[0]
        ids = pad_rows_pow2(ids)
        return np.asarray(self._encode_pooled(self.clip_params, jnp.asarray(ids)))[:n]

    def _grounding_tensors(self, captions, labels_list):
        """Per-box phrase embeddings + relation embeddings (the grounding
        prepare of trainer_combined_layout.py:334-369,410)."""
        cfg = self.config
        b = len(captions)
        pos = np.zeros((b, cfg.max_boxes, self.clip_cfg.hidden_size), np.float32)
        flat, where = [], []
        for i, labels in enumerate(labels_list):
            for j, lab in enumerate(labels[: cfg.max_boxes]):
                flat.append(lab)
                where.append((i, j))
        if flat:
            emb = self.encode_texts_pooled(flat)
            for (i, j), e in zip(where, emb):
                pos[i, j] = e

        rel = np.zeros((b, cfg.max_relations, self.clip_cfg.hidden_size), np.float32)
        for i, cap in enumerate(captions):
            texts = relation_texts_for_training(cap, cfg.max_relations)
            if texts:
                rel[i, : len(texts)] = self.encode_texts_pooled(texts)
        return pos, rel

    def _to_global(self, x):
        """Host array -> global device array over the data mesh.

        Single host: a plain device_put with the batch sharding. Multi-host:
        each process holds only its LOCAL shard of the global batch (the data
        loader feeds per-process slices, like the reference's
        DistributedSampler, trainer_combined_layout.py:288), and
        ``make_array_from_process_local_data`` assembles the global array
        without any cross-host transfer."""
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(self._data_sharding, x)
        return jax.device_put(jnp.asarray(x), self._data_sharding)

    def prepare_batch(self, batch, rng):
        """Host batch -> device model inputs (get_input + grounding prepare,
        trainer_combined_layout.py:371-410). On multi-host, ``batch`` is this
        process's local shard of the global batch."""
        captions = batch["caption"]
        ids = self.tokenizer(captions)
        images = self._to_global(np.asarray(batch["image"], np.float32))
        ids_g = self._to_global(np.asarray(ids))
        z, context = self._encode(self.vae_params, self.clip_params,
                                  images, ids_g, rng)
        pos, rel = self._grounding_tensors(captions, batch["labels"])

        return {
            "z": z,
            "context": context,
            "boxes": self._to_global(np.asarray(batch["boxes"], np.float32)),
            "masks": self._to_global(np.asarray(batch["masks"], np.float32)),
            "phrase_embeddings": self._to_global(pos),
            "relations": self._to_global(rel),
        }

    # -- training loop -------------------------------------------------------

    def train(self):
        cfg = self.config
        it = iter(self.dataset)
        t_last = time.time()
        for iter_idx in range(self.starting_iter, cfg.total_iters):
            self.rng, r_enc, r_step = jax.random.split(self.rng, 3)
            host_batch = next(it)
            batch = self.prepare_batch(host_batch, r_enc)
            self.state, loss = self._train_step(self.state, self.frozen_params,
                                                batch, r_step)

            if is_primary() and (iter_idx % cfg.log_every == 0):
                loss_v = float(loss)
                dt = time.time() - t_last
                t_last = time.time()
                self.metrics.log(iter_idx, loss=loss_v, sec_per_iter=dt / max(cfg.log_every, 1))
                if self.tb is not None:
                    self.tb.add_scalar("loss", loss_v, iter_idx + 1)
                self.logger.write(f"iter {iter_idx}: loss={loss_v:.5f}")

            if is_primary() and (
                iter_idx == cfg.total_iters - 1
                or (iter_idx > 0 and iter_idx % cfg.save_every_iters == 0)
            ):
                if not cfg.disable_inference_in_training:
                    self.sample_previews(host_batch, iter_idx + 1)
                self.save_ckpt(iter_idx + 1)
        # join the in-flight async checkpoint write (and surface its error)
        # before declaring the run done
        self.ckpt_writer.wait()
        self.logger.write("Training finished.")

    # -- periodic sample previews (trainer_combined_layout.py:457-521) --------

    def _combined_unet_params(self):
        from .train_step import combine_params

        return combine_params(
            jax.tree.map(np.asarray, self.state.params), self.frozen_params)

    def _preview_pipeline(self):
        """Lazily build ONE InferencePipeline for previews so the sampling
        program compiles once and fresh params ride as jit arguments each
        preview (an eagerly traced scan closing over SD-scale params is a
        multi-GB constant blob the remote compiler refuses)."""
        if self._preview_pipe is None:
            from ..pipeline.inference import GligenModels, InferencePipeline

            models = GligenModels(
                unet_cfg=self.unet_cfg, unet_params=None, vae_cfg=self.vae_cfg,
                vae_params=self.vae_params, clip_cfg=self.clip_cfg,
                clip_params=self.clip_params, schedule=self.schedule,
                tokenizer=self.tokenizer, max_relas=self.config.max_relations,
                compute_dtype=(jnp.bfloat16 if self.config.mixed_precision
                               else jnp.float32),
            )
            self._preview_pipe = InferencePipeline(
                models, steps=self.config.preview_steps, sampler="plms",
                guidance_scale=self.config.preview_guidance, alpha_type=None)
        return self._preview_pipe

    def sample_previews(self, host_batch, iter_name: int):
        """PLMS sample grid from the current params on a training batch
        (reference: S=50, guidance 5, no alpha schedule)."""
        from ..utils.images import save_image_grid

        captions = list(host_batch["caption"])
        b = len(captions)
        pipe = self._preview_pipeline()
        params = jax.device_put(self._combined_unet_params())
        context = jnp.asarray(pipe.encode_text(captions))
        uc = jnp.asarray(pipe.encode_text([""] * b))
        pos, rel = self._grounding_tensors(captions, host_batch["labels"])
        cond = {
            "context": context, "uc_context": uc,
            "boxes": jnp.asarray(host_batch["boxes"], jnp.float32),
            "masks": jnp.asarray(host_batch["masks"], jnp.float32),
            "phrase_embeddings": jnp.asarray(pos),
            "relations": jnp.asarray(rel),
        }
        self.rng, r_noise = jax.random.split(self.rng)
        noise = jax.random.normal(
            r_noise, (b, self.unet_cfg.image_size, self.unet_cfg.image_size,
                      self.unet_cfg.in_channels), jnp.float32)
        imgs = np.asarray(
            pipe._sample_jit(params, self.vae_params, None, cond, noise, r_noise))
        out_path = os.path.join(self.run_dir, f"samples_{iter_name:08d}.png")
        save_image_grid(imgs, out_path, captions)
        real = np.asarray(host_batch["image"]) * 0.5 + 0.5
        save_image_grid(real, os.path.join(self.run_dir,
                                           f"real_{iter_name:08d}.png"))
        self.logger.write(f"saved sample previews to {out_path}")

    def save_ckpt(self, iter_name: int):
        # Synchronous part: device->host snapshot of everything the write
        # needs. The next (donated) train step invalidates the old device
        # buffers, so the snapshot cannot be deferred to the writer thread.
        host_state = jax.tree.map(np.asarray, tuple(self.state))
        payload = {"state": host_state, "iters": iter_name}
        cfg_dict = dataclasses.asdict(self.config)
        cfg_dict["unet_cfg"] = dataclasses.asdict(self.unet_cfg)
        # embed ALL module configs: the ckpt is the load-time source of truth
        # (trainer_combined_layout.py:523-535 semantics) — without these a
        # non-default (e.g. --small) export can't round-trip through
        # load_models_from_gligen_ckpt (full-size CLIP/VAE get assumed)
        cfg_dict["vae_cfg"] = dataclasses.asdict(self.vae_cfg)
        cfg_dict["clip_cfg"] = dataclasses.asdict(self.clip_cfg)
        path = os.path.join(self.run_dir, f"checkpoint_{iter_name:08d}")
        export_args = None
        if self.config.export_reference_ckpt:
            ema_combined = None
            if self.state.ema_params is not None:
                from .train_step import combine_params

                ema_combined = combine_params(
                    jax.tree.map(np.asarray, self.state.ema_params),
                    self.frozen_params)
            export_args = (
                self._combined_unet_params(),
                jax.tree.map(np.asarray, self.vae_params),
                jax.tree.map(np.asarray, self.clip_params),
                ema_combined,
            )

        def _write():
            save_checkpoint(path, payload, cfg_dict)
            save_checkpoint(os.path.join(self.run_dir, "checkpoint_latest"),
                            payload, cfg_dict)
            if export_args is not None:
                from ..checkpoint.export import export_gligen_checkpoint

                unet_p, vae_p, clip_p, ema_p = export_args
                pth = os.path.join(self.run_dir,
                                   f"checkpoint_{iter_name:08d}.pth")
                export_gligen_checkpoint(
                    pth, unet_p, vae_p, clip_p, self.schedule, cfg_dict,
                    iters=iter_name, ema_unet_params=ema_p)
                self.logger.write(f"exported reference-format ckpt to {pth}")
            self.logger.write(f"saved checkpoint to {path}")

        if self.config.async_ckpt:
            self.ckpt_writer.submit(_write)
        else:
            _write()
