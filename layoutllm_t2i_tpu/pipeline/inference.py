"""Layout-grounded generation pipeline (the GLIGEN/interface.py equivalent).

Everything device-side is one jitted program per (batch, steps, sampler)
signature: CLIP text encode -> PLMS/DDIM scan over the UNet -> VAE decode.
Host code only builds fixed-shape (max_objs=30, max_relas) tensors from the
ragged layout, mirroring interface.py:157-290.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..diffusion.samplers import StepTables, ddim_sample, make_step_tables, plms_sample
from ..models.clip_text import CLIPTextConfig, clip_text_apply
from ..models.unet import UNetConfig, _apply_position_net, unet_apply
from ..models.vae import VAEConfig, decode as vae_decode
from ..ops.schedules import DDPMSchedule
from ..utils.trees import override_subtree


@dataclasses.dataclass
class GligenModels:
    """Bundle of the four converted modules (cf. interface.py load_all_models)."""

    unet_cfg: UNetConfig
    unet_params: Any
    vae_cfg: VAEConfig
    vae_params: Any
    clip_cfg: CLIPTextConfig
    clip_params: Any
    schedule: DDPMSchedule
    tokenizer: Any
    # SD first-conv weights for the alpha==0 restore (openaimodel.py:393-408);
    # dict with 'weight'/'bias' in JAX layout, or None to disable the swap.
    sd_first_conv: Optional[dict] = None
    max_objs: int = 30
    max_relas: int = 5
    compute_dtype: Any = jnp.float32


# ---------------------------------------------------------------------------
# host-side fixed-shape batch prep


def pack_layout(
    boxes: Sequence[Sequence[float]],
    phrase_embeddings: np.ndarray,
    max_objs: int = 30,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged layout -> (boxes (MO,4), masks (MO,), embeddings (MO,768)).

    boxes are normalized xyxy (callers convert from xywh/xcycwh first);
    mirrors interface.py prepare_batch:157-219.
    """
    n = min(len(boxes), max_objs)
    out_boxes = np.zeros((max_objs, 4), dtype=np.float32)
    out_masks = np.zeros((max_objs,), dtype=np.float32)
    dim = phrase_embeddings.shape[-1] if len(phrase_embeddings) else 768
    out_emb = np.zeros((max_objs, dim), dtype=np.float32)
    if n:
        out_boxes[:n] = np.asarray(boxes, dtype=np.float32)[:n]
        out_masks[:n] = 1.0
        out_emb[:n] = phrase_embeddings[:n]
    return out_boxes, out_masks, out_emb


def convert_xywh_to_ltrb(box):
    x, y, w, h = box
    return [x, y, x + w, y + h]


def convert_xcycwh_to_ltrb(box):
    xc, yc, w, h = box
    return [xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2]


# ---------------------------------------------------------------------------
# device-side programs


def precompute_grounding_tokens(models: GligenModels, unet_params, cond,
                                use_cfg: bool):
    """Grounding tokens are step-invariant; computing them once before the
    sampling scan removes one position_net eval per UNet call (the reference
    recomputes per step, openaimodel.py:426). Returns the (2B or B, N, C)
    tokens matching the CFG batch layout of make_cfg_denoiser."""
    cfg = models.unet_cfg
    eg = cond.get("extra_grounding")
    objs_c = _apply_position_net(unet_params["position_net"], cfg,
                                 cond["boxes"], cond["masks"],
                                 cond["phrase_embeddings"], eg)
    if not use_cfg:
        return objs_c
    eg_null = (None if eg is None
               else {k: jnp.zeros_like(v) for k, v in eg.items()})
    objs_u = _apply_position_net(unet_params["position_net"], cfg,
                                 jnp.zeros_like(cond["boxes"]),
                                 jnp.zeros_like(cond["masks"]),
                                 jnp.zeros_like(cond["phrase_embeddings"]),
                                 eg_null)
    return jnp.concatenate([objs_c, objs_u])


def parse_cfg_interval(spec) -> Optional[Tuple[float, float]]:
    """Parse/validate a guidance interval: "LO,HI" string or a 2-sequence of
    step fractions, 0 <= LO < HI. Shared by every CLI so the validation
    lives in one place; returns None for empty/None.

    NOTE (arXiv:2404.07724): the paper's FID gain comes from disabling CFG
    at the HIGHEST noise levels — i.e. LO > 0 (early steps off), not just
    trimming the low-noise tail. Tune on the quality gate (eval/nss1k)."""
    if spec is None or spec == "":
        return None
    parts = spec.split(",") if isinstance(spec, str) else list(spec)
    try:
        vals = tuple(float(v) for v in parts)
    except (TypeError, ValueError):
        raise ValueError(f"cfg_interval: want 'LO,HI' fractions, got {spec!r}")
    if len(vals) != 2:
        raise ValueError(f"cfg_interval: want exactly 2 values, got {spec!r}")
    lo, hi = vals
    if not (0.0 <= lo < hi):
        raise ValueError(
            f"cfg_interval: need 0 <= LO < HI (got {lo}, {hi}); a reversed "
            "interval would silently disable guidance everywhere")
    return vals


def make_cfg_denoiser(
    models: GligenModels,
    guidance_scale: float,
    attn_impl: str = "auto",
    cfg_override: Optional[bool] = None,
):
    """Returns denoise(params, sd_conv, cond, x, t, fuser_scale, use_sd) with
    classifier-free guidance run as one doubled batch (the reference issues
    two sequential UNet calls, plms.py:115-124). If ``cond['objs']`` holds
    precomputed grounding tokens (precompute_grounding_tokens), position_net
    is skipped inside the scan.

    ``cfg_override=False`` forces the single-batch cond-only path regardless
    of guidance_scale — the guidance-interval mode (arXiv:2404.07724) runs
    steps outside the interval through this variant at half the batch."""
    cfg = models.unet_cfg
    dtype = models.compute_dtype
    use_cfg = (guidance_scale != 1.0) if cfg_override is None else cfg_override

    def denoise(params, sd_conv, cond, x, t, fuser_scale, use_sd,
                skip_gated: bool = False, cache=None, is_key=None):
        """cache/is_key: encoder-propagation mode (unet.py encoder_cache,
        arXiv:2312.09608) — returns (eps, new_cache) instead of eps. is_key
        selects (via lax.cond) between a full forward that refreshes the
        cache and a decoder-only forward consuming it."""
        if sd_conv is not None and cfg.first_conv_restorable:
            first = params["input_blocks"]["0"]["0"]
            blended = {
                "weight": jnp.where(use_sd, sd_conv["weight"].astype(first["weight"].dtype),
                                    first["weight"]),
                "bias": jnp.where(use_sd, sd_conv["bias"].astype(first["bias"].dtype),
                                  first["bias"]),
            }
            params = override_subtree(params, ("input_blocks", "0", "0"), blended)

        xm = x.astype(dtype)
        grounding_extra = cond.get("grounding_extra")      # downsampled maps
        inpainting_extra = cond.get("inpainting_extra")    # masked z + mask
        extra_grounding = cond.get("extra_grounding")      # text_image inputs
        if use_cfg:
            # uncond half: empty-text context, null (zero) grounding; the
            # extra input channels and relations ride through unchanged
            # (plms.py:118-121)
            dup = lambda a: None if a is None else jnp.concatenate([a, a])
            x_in = jnp.concatenate([xm, xm])
            t_in = jnp.concatenate([t, t])
            ctx = jnp.concatenate([cond["context"], cond["uc_context"]]).astype(dtype)
            boxes = jnp.concatenate([cond["boxes"], jnp.zeros_like(cond["boxes"])])
            masks = jnp.concatenate([cond["masks"], jnp.zeros_like(cond["masks"])])
            pos = jnp.concatenate(
                [cond["phrase_embeddings"], jnp.zeros_like(cond["phrase_embeddings"])]
            ).astype(dtype)
            rel = jnp.concatenate([cond["relations"], cond["relations"]]).astype(dtype)
            eg_in = (None if extra_grounding is None
                     else {k: jnp.concatenate([v, jnp.zeros_like(v)])
                           for k, v in extra_grounding.items()})
            ie_in = dup(inpainting_extra)
            ge_in = dup(grounding_extra)
        else:
            x_in, t_in = xm, t
            ctx = cond["context"].astype(dtype)
            boxes, masks = cond["boxes"], cond["masks"]
            pos = cond["phrase_embeddings"].astype(dtype)
            rel = cond["relations"].astype(dtype)
            eg_in, ie_in, ge_in = extra_grounding, inpainting_extra, grounding_extra

        objs_in = cond.get("objs")
        if (objs_in is not None and not use_cfg
                and objs_in.shape[0] == 2 * xm.shape[0]):
            # grounding tokens were precomputed at CFG layout ([cond; null],
            # precompute_grounding_tokens) but this is the cond-only variant
            # (guidance-interval off-steps): keep the cond half
            objs_in = objs_in[: xm.shape[0]]

        def call_unet(xi, enc_cache, return_cache):
            return unet_apply(params, cfg, xi, t_in, ctx, boxes, masks, pos,
                              rel, fuser_scale=fuser_scale,
                              inpainting_extra=ie_in, grounding_extra=ge_in,
                              attn_impl=attn_impl, extra_grounding=eg_in,
                              objs=objs_in, skip_gated=skip_gated,
                              encoder_cache=enc_cache,
                              return_encoder_cache=return_cache)

        def combine(eps):
            if not use_cfg:
                return eps.astype(jnp.float32)
            e_cond, e_uncond = jnp.split(eps.astype(jnp.float32), 2)
            return e_uncond + guidance_scale * (e_cond - e_uncond)

        if cache is None:
            return combine(call_unet(x_in, None, False))
        if isinstance(cache, str):  # "init": key-path-only trace for
            # cache shape inference (no cond — the prop branch would need
            # the very structure being derived)
            eps, new_cache = call_unet(x_in, None, True)
            return combine(eps), new_cache
        eps, new_cache = jax.lax.cond(
            is_key,
            lambda xi, c: call_unet(xi, None, True),
            lambda xi, c: (call_unet(xi, c, False), c),
            x_in, cache)
        return combine(eps), new_cache

    return denoise


class InferencePipeline:
    """Compiled text+layout -> image sampler.

    One instance caches jitted programs keyed by (batch, steps, sampler,
    guidance) so repeated prompts hit the compile cache.
    """

    def __init__(self, models: GligenModels, steps: int = 50, sampler: str = "plms",
                 guidance_scale: float = 7.5, alpha_type=(0.3, 0.0, 0.7),
                 eta: float = 0.0, attn_impl: str = "auto",
                 vae_chunk: Optional[int] = None,
                 encoder_cache_interval: Optional[int] = None,
                 cfg_interval: Optional[Tuple[float, float]] = None):
        self.models = models
        self.steps = steps
        self.sampler = sampler
        self.guidance_scale = guidance_scale
        self.alpha_type = tuple(alpha_type) if alpha_type is not None else None
        self.eta = eta
        self.attn_impl = attn_impl
        # encoder propagation (arXiv:2312.09608, APPROXIMATE, opt-in): run
        # the UNet encoder only every Nth step, reusing the cached skip
        # features in between; 1/None = exact default. Ignored for
        # inpainting (the blend must flow through the encoder every step).
        self.encoder_cache_interval = (
            None if not encoder_cache_interval or encoder_cache_interval <= 1
            else int(encoder_cache_interval))
        # guidance interval (arXiv:2404.07724): apply CFG only on the steps
        # whose fraction of the sequence lies in [lo, hi]; outside, run the
        # cond-only denoiser at HALF the batch (exact FLOP reduction; the
        # paper reports FID *improves* when guidance is confined to the
        # middle noise levels). None = CFG on every step (reference
        # behavior, plms.py:115-124).
        self.cfg_interval = parse_cfg_interval(cfg_interval)
        # decode the VAE in batch chunks: 512^2 decode activations are ~64MB
        # per image and the full-batch decode is the peak-HBM site of the
        # sampler (a b=16 decode crashed the v5e worker); conv MFU saturates
        # by chunk 8 anyway (PERF.md batch-scaling probe)
        self.vae_chunk = vae_chunk
        self.tables: StepTables = make_step_tables(
            models.schedule, steps, eta=eta, alpha_type=self.alpha_type
        )
        self._encode_jit = jax.jit(self._encode_fn)
        self._sample_jit = jax.jit(self._sample_fn)
        self._sharded_jit = None
        self._sharded_mesh = None
        self._tp_jits = {}

    # -- text encode ------------------------------------------------------

    def _encode_fn(self, clip_params, input_ids):
        return clip_text_apply(clip_params, self.models.clip_cfg, input_ids)

    def _encode_bucketed(self, texts: List[str]):
        """Tokenize and encode with the batch padded to a power-of-two bucket
        so ragged phrase counts don't retrigger compilation."""
        from ..utils.buckets import pad_rows_pow2

        ids = self.models.tokenizer(texts)
        n = ids.shape[0]
        ids = pad_rows_pow2(ids)
        hidden, pooled = self._encode_jit(self.models.clip_params, jnp.asarray(ids))
        return hidden[:n], pooled[:n]

    def encode_text(self, texts: List[str]) -> np.ndarray:
        hidden, _ = self._encode_bucketed(texts)
        return hidden

    def encode_pooled(self, texts: List[str]) -> np.ndarray:
        """Pooled (eot) embedding per text — used for per-phrase grounding
        tokens (encode_one_token, modules.py:176-184) and relation triplets."""
        _, pooled = self._encode_bucketed(texts)
        return pooled

    # -- sampling ---------------------------------------------------------

    def _key_steps(self) -> np.ndarray:
        """Static (S,) bool table for encoder propagation: a full (key)
        forward every Nth step within each constant-(fuser_scale==0, cfg_on)
        segment — segment starts are forced key, so a propagated step never
        consumes a cache computed under a different first-conv / skip_gated
        regime, or a batch-resized placeholder cache at a guidance-interval
        boundary (samplers._resize_cache)."""
        fuser = np.asarray(self.tables.fuser_scale)
        zero = fuser == 0
        cfg_on = (self._cfg_on_steps() if self.cfg_interval
                  and self.guidance_scale != 1.0
                  else np.ones(len(fuser), dtype=bool))
        keys = np.zeros(len(fuser), dtype=bool)
        seg_start = 0
        for i in range(len(fuser)):
            if i and (zero[i], cfg_on[i]) != (zero[i - 1], cfg_on[i - 1]):
                seg_start = i
            keys[i] = (i - seg_start) % self.encoder_cache_interval == 0
        return keys

    def _cfg_on_steps(self) -> np.ndarray:
        """(S,) bool: True where CFG applies (guidance-interval mode)."""
        lo, hi = self.cfg_interval
        s = int(self.tables.t.shape[0])
        frac = np.arange(s) / max(s - 1, 1)
        return (frac >= lo) & (frac <= hi)

    def _sample_fn(self, unet_params, vae_params, sd_conv, cond, noise, rng):
        denoise_core = make_cfg_denoiser(self.models, self.guidance_scale, self.attn_impl)
        # hoist the step-invariant grounding tokens out of the sampling scan
        cond = dict(cond)
        cond["objs"] = precompute_grounding_tokens(
            self.models, unet_params, cond, self.guidance_scale != 1.0)

        def denoise(x, t, fscale, use_sd, **kw):
            return denoise_core(unet_params, sd_conv, cond, x, t, fscale,
                                use_sd, **kw)

        def denoise_skip(x, t, fscale, use_sd, **kw):
            # reduced body for the statically-zero alpha steps: the sampler
            # only calls this where fuser_scale == 0 (see _alpha_segments)
            return denoise_core(unet_params, sd_conv, cond, x, t, fscale,
                                use_sd, skip_gated=True, **kw)

        from ..diffusion.samplers import dpm_sample

        sample = {"plms": plms_sample, "ddim": ddim_sample,
                  "dpm": dpm_sample}[self.sampler]
        inpaint = None
        if cond.get("inpaint_mask") is not None:
            from ..diffusion.samplers import InpaintBlend

            inpaint = InpaintBlend(mask=cond["inpaint_mask"], z0=cond["inpaint_z0"])
        cache_kw: dict = {}
        if self.cfg_interval and self.guidance_scale != 1.0:
            nc_core = make_cfg_denoiser(self.models, self.guidance_scale,
                                        self.attn_impl, cfg_override=False)

            def denoise_nc(x, t, fscale, use_sd, **kw):
                return nc_core(unet_params, sd_conv, cond, x, t, fscale,
                               use_sd, **kw)

            def denoise_nc_skip(x, t, fscale, use_sd, **kw):
                return nc_core(unet_params, sd_conv, cond, x, t, fscale,
                               use_sd, skip_gated=True, **kw)

            cache_kw.update(denoise_nocfg_fn=denoise_nc,
                            denoise_nocfg_skip_fn=denoise_nc_skip,
                            cfg_on=self._cfg_on_steps())
        if self.encoder_cache_interval and inpaint is None:
            t0 = jnp.full((noise.shape[0],), self.tables.t[0])
            # cache batch layout must match the FIRST segment's CFG state
            # (2B for CFG segments, B for cond-only); boundary resizes are
            # the sampler's job (_resize_cache + forced key steps)
            first_cfg = ("cfg_on" not in cache_kw
                         or bool(cache_kw["cfg_on"][0]))
            init_fn = denoise if first_cfg else cache_kw["denoise_nocfg_fn"]
            cache_shapes = jax.eval_shape(
                lambda nz: init_fn(nz, t0, 1.0, False, cache="init",
                                   is_key=True)[1], noise)
            cache_kw.update(
                cache_init=jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes),
                key_steps=self._key_steps(),
            )
        z = sample(denoise, self.tables, noise, schedule=self.models.schedule,
                   inpaint=inpaint, rng=rng, denoise_skip_fn=denoise_skip,
                   **cache_kw)
        z = z.astype(self.models.compute_dtype)
        b = z.shape[0]
        if self.vae_chunk and self.vae_chunk < b:
            # decode in chunks; a non-dividing tail is decoded separately so
            # the peak-HBM cap still applies at e.g. b=12, chunk=8
            n_full = b // self.vae_chunk
            head, tail = jnp.split(z, [n_full * self.vae_chunk])
            zc = head.reshape(n_full, self.vae_chunk, *z.shape[1:])
            img = jax.lax.map(
                lambda zi: vae_decode(vae_params, self.models.vae_cfg, zi), zc)
            img = img.reshape(n_full * self.vae_chunk, *img.shape[2:])
            if tail.shape[0]:
                img = jnp.concatenate(
                    [img, vae_decode(vae_params, self.models.vae_cfg, tail)])
        else:
            img = vae_decode(vae_params, self.models.vae_cfg, z)
        img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
        return img

    def build_cond(self, prompts: List[str], layouts, relation_texts=None,
                   phrase_embeddings=None, relation_embeddings=None):
        """layouts: list of (boxes_ltrb, phrases) per prompt. Pre-computed
        phrase/relation embeddings skip the CLIP calls (cached-layout mode)."""
        m = self.models
        b = len(prompts)
        context = self.encode_text(prompts)
        uc = self.encode_text([""] * b)

        # one batched CLIP call for all phrases + relation texts across the
        # batch (per-sample calls pay one device dispatch each)
        flat_texts: List[str] = []
        spans = []
        for i, (_bxs, phrases) in enumerate(layouts):
            if phrase_embeddings is None and len(phrases):
                spans.append(("phrase", i, len(flat_texts), len(phrases)))
                flat_texts.extend(list(phrases))
        if relation_embeddings is None and relation_texts is not None:
            for i, texts in enumerate(relation_texts):
                if texts:
                    texts = list(texts)[: m.max_relas]
                    spans.append(("rel", i, len(flat_texts), len(texts)))
                    flat_texts.extend(texts)
        gdim = m.unet_cfg.grounding_in_dim
        cdim = m.unet_cfg.context_dim
        flat_emb = (np.asarray(self.encode_pooled(flat_texts))
                    if flat_texts else np.zeros((0, gdim), np.float32))

        boxes = np.zeros((b, m.max_objs, 4), dtype=np.float32)
        masks = np.zeros((b, m.max_objs), dtype=np.float32)
        pos = np.zeros((b, m.max_objs, gdim), dtype=np.float32)
        rel = np.zeros((b, m.max_relas, cdim), dtype=np.float32)
        per_sample_phrase = {i: np.zeros((0, gdim), np.float32) for i in range(b)}
        for kind, i, off, n in spans:
            if kind == "phrase":
                per_sample_phrase[i] = flat_emb[off:off + n]
            else:
                rel[i, :n] = flat_emb[off:off + n]
        for i, (bxs, _phrases) in enumerate(layouts):
            emb = (phrase_embeddings[i] if phrase_embeddings is not None
                   else per_sample_phrase[i])
            boxes[i], masks[i], pos[i] = pack_layout(bxs, emb, m.max_objs)
        if relation_embeddings is not None:
            rel = np.asarray(relation_embeddings, dtype=np.float32)

        return {
            "context": context,
            "uc_context": uc,
            "boxes": jnp.asarray(boxes),
            "masks": jnp.asarray(masks),
            "phrase_embeddings": jnp.asarray(pos),
            "relations": jnp.asarray(rel),
        }

    def sample_latents(self, cond, noise, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        m = self.models
        return self._sample_jit(m.unet_params, m.vae_params, m.sd_first_conv,
                                cond, noise, rng)

    # -- multi-device prompt-parallel sampling ------------------------------

    def sample_latents_sharded(self, mesh, cond, noise, rng=None):
        """Shard the prompt batch over the mesh's 'data' axis (params
        replicated); for generation sweeps this is the reference's num_per_
        prompt/DP axis (SURVEY.md §7)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._sharded_jit is None or self._sharded_mesh is not mesh:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._sharded_jit = jax.jit(
                self._sample_fn,
                in_shardings=(repl, repl, repl, data, data, repl),
                out_shardings=data,
            )
            self._sharded_mesh = mesh
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        m = self.models
        return self._sharded_jit(m.unet_params, m.vae_params, m.sd_first_conv,
                                 cond, noise, rng)

    # -- tensor-parallel latency sampling ------------------------------------

    def sample_latents_tp(self, mesh, cond, noise, rng=None,
                          style: str = "spatial"):
        """TP LATENCY mode: params/inputs replicated over the mesh's 'model'
        axis; GSPMD partitions the per-image compute from the activation
        constraints in ops/ (see parallel/tp.py — the reference has no TP
        counterpart; its only parallelism is DDP, GLIGEN/main.py:59-65).
        style 'spatial' (default) shards image rows/tokens everywhere incl.
        the convs; 'heads' is the Megatron attention/FF pattern with convs
        replicated. Use for single-image p50, not throughput:
        generate_sharded (prompt-DP) is communication-free and scales
        linearly."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.tp import tp_mode

        # Mesh hashes by device grid + axis names: equal meshes share the
        # compiled program, and a GC'd mesh's recycled id() can't alias a
        # different topology
        key = (mesh, style)
        if key not in self._tp_jits:
            repl = NamedSharding(mesh, P())

            # fresh function identity: jax's trace cache keys on the bound
            # method, and a prior NON-tp trace of _sample_fn with the same
            # signature would be silently reused, dropping the constraints
            def _tp_fn(up, vp, sc, cond, noise, rng):
                return self._sample_fn(up, vp, sc, cond, noise, rng)

            self._tp_jits[key] = jax.jit(_tp_fn, in_shardings=(repl,) * 6,
                                         out_shardings=repl)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        m = self.models
        # tp_mode is trace-time state: it must be live on the FIRST call
        # (which traces); cached dispatches ignore it
        with tp_mode(mesh, style=style):
            return self._tp_jits[key](m.unet_params, m.vae_params,
                                      m.sd_first_conv, cond, noise, rng)

    def generate_sharded(self, mesh, prompts: List[str], layouts,
                         relation_texts=None, seed: int = 42, **cond_kwargs) -> np.ndarray:
        n_dev = mesh.devices.size
        assert len(prompts) % n_dev == 0, (
            f"batch {len(prompts)} must divide over {n_dev} devices")
        m = self.models
        cond = self.build_cond(prompts, layouts, relation_texts, **cond_kwargs)
        knoise, krun = jax.random.split(jax.random.PRNGKey(seed))
        noise = jax.random.normal(
            knoise, (len(prompts), m.unet_cfg.image_size, m.unet_cfg.image_size,
                     m.unet_cfg.in_channels), jnp.float32)
        img = self.sample_latents_sharded(mesh, cond, noise, krun)
        return np.asarray(img)

    def _batch_noise(self, b: int, seed: int, seeds: Optional[List[int]]):
        """(noise (b,h,w,c), krun). With per-row ``seeds``, each row's noise is
        a function of ITS seed alone, so a request reproduces identically
        regardless of how a serving batch was composed (serving/batcher.py).
        NOTE: that contract holds for the deterministic samplers (PLMS,
        DDIM eta=0 — the production configs); an eta>0 DDIM additionally
        draws per-step batch-wide noise from krun, which depends on row
        order. Default: one batch draw from ``seed``."""
        m = self.models
        shape = (m.unet_cfg.image_size, m.unet_cfg.image_size,
                 m.unet_cfg.in_channels)
        if seeds is not None:
            if len(seeds) != b:
                raise ValueError(f"seeds: want {b} entries, got {len(seeds)}")
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
            noise = jax.vmap(
                lambda k: jax.random.normal(k, shape, jnp.float32))(keys)
            krun = jax.random.PRNGKey(int(seeds[0]))
        else:
            knoise, krun = jax.random.split(jax.random.PRNGKey(seed))
            noise = jax.random.normal(knoise, (b,) + shape, jnp.float32)
        return noise, krun

    def generate_tp(self, mesh, prompts: List[str], layouts,
                    relation_texts=None, seed: int = 42,
                    seeds: Optional[List[int]] = None,
                    style: str = "spatial", **cond_kwargs) -> np.ndarray:
        """LATENCY-mode generate: one (small) prompt batch, per-image compute
        sharded over the mesh (sample_latents_tp)."""
        cond = self.build_cond(prompts, layouts, relation_texts, **cond_kwargs)
        noise, krun = self._batch_noise(len(prompts), seed, seeds)
        return np.asarray(self.sample_latents_tp(mesh, cond, noise, krun,
                                                 style=style))

    def generate(self, prompts: List[str], layouts, relation_texts=None, seed: int = 42,
                 seeds: Optional[List[int]] = None, **cond_kwargs) -> np.ndarray:
        """Returns (B, 512, 512, 3) float images in [0, 1]. ``seeds``: see
        _batch_noise (per-request reproducibility for serving batches)."""
        cond = self.build_cond(prompts, layouts, relation_texts, **cond_kwargs)
        noise, krun = self._batch_noise(len(prompts), seed, seeds)
        img = self.sample_latents(cond, noise, krun)
        return np.asarray(img)


def images_to_uint8(images: np.ndarray) -> np.ndarray:
    return (np.clip(images, 0, 1) * 255).astype(np.uint8)
