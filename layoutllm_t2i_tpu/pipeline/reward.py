"""Composite RL reward: CLIP text-image + image-image similarity, aesthetic
MLP (x0.1), Hungarian max-IoU (x10) and DocSim (x10).

Reference: models/policy.py:36-138 (Reward). Device work (CLIP towers,
aesthetic MLP, cosine sims) is jitted; open-vocabulary label -> nearest
COCO-80 class runs through cached CLIP text features; Hungarian assignment
stays on host (scipy) since layouts are tiny.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..eval.metrics import compute_docsim, compute_maximum_iou
from ..models.clip_text import CLIPTextConfig, clip_text_features
from ..models.clip_vision import (
    CLIPVisionConfig, clip_image_features, preprocess_images,
)
from ..models.policy import aesthetic_apply, l2_normalize

COCO80_LABELS = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

Layout = Tuple[Sequence[Sequence[float]], Sequence[str]]  # (boxes, labels)


@dataclasses.dataclass
class RewardModel:
    text_cfg: CLIPTextConfig
    text_params: Any        # includes text_projection
    vision_cfg: CLIPVisionConfig
    vision_params: Any      # includes visual_projection
    aesthetic_params: Any
    tokenizer: Any

    def __post_init__(self):
        # converted-ckpt params arrive as host numpy; an uncommitted
        # device_put up front stops every jitted call re-transferring the
        # towers (same bug class as the ckpt loader's 3.2x loss, PERF.md r5)
        self.text_params = jax.tree.map(jax.device_put, self.text_params)
        self.vision_params = jax.tree.map(jax.device_put, self.vision_params)
        self.aesthetic_params = jax.tree.map(jax.device_put, self.aesthetic_params)
        # params are jit ARGUMENTS, not closure constants: closed-over weight
        # pytrees get baked into the HLO as literals, which blows up the
        # axon remote-compile upload (the diffusion trainer hit HTTP 413 on
        # exactly this, PERF.md r3) — same idiom as pipeline/inference.py
        self._text_feat = jax.jit(
            lambda p, ids: clip_text_features(p, self.text_cfg, ids))
        self._image_feat = jax.jit(
            lambda p, imgs: clip_image_features(
                p, self.vision_cfg, preprocess_images(imgs, self.vision_cfg))
        )
        self._aesthetic = jax.jit(aesthetic_apply)
        self.label2index = {l: i for i, l in enumerate(COCO80_LABELS)}
        labels_emb = self.text_features(COCO80_LABELS)
        self.labels_emb = np.asarray(l2_normalize(labels_emb))
        self._label_cache: dict = {}

    # -- features ---------------------------------------------------------

    def text_features(self, texts: List[str]) -> jnp.ndarray:
        ids = self.tokenizer(texts)
        return self._text_feat(self.text_params, jnp.asarray(ids))

    def image_features(self, images: np.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) float in [0, 1]."""
        return self._image_feat(self.vision_params,
                                jnp.asarray(images, dtype=jnp.float32))

    # -- open-vocab label mapping (policy.py:84-102) ------------------------

    def nearest_coco_label(self, label: str) -> str:
        if label in self.label2index:
            return label
        if label in self._label_cache:
            return self._label_cache[label]
        emb = np.asarray(l2_normalize(self.text_features([label])))
        sim = emb @ self.labels_emb.T
        out = COCO80_LABELS[int(sim.flatten().argmax())]
        self._label_cache[label] = out
        return out

    def _layout_ids(self, layouts: List[Layout], close_set: bool):
        out = []
        for boxes, labels in layouts:
            if close_set:
                labels = [self.nearest_coco_label(l) for l in labels]
            ids = [self.label2index[l] for l in labels]
            out.append((np.asarray(boxes, dtype=np.float64), np.asarray(ids)))
        return out

    # -- composite reward (policy.py:105-138) --------------------------------

    def __call__(self, captions: List[str], imgs_pred: np.ndarray,
                 imgs_gt: np.ndarray, layout_pred: List[Layout],
                 layout_gt: List[Layout]) -> np.ndarray:
        txt = l2_normalize(self.text_features(captions))
        fp = l2_normalize(self.image_features(imgs_pred))
        fg = l2_normalize(self.image_features(imgs_gt))
        sims_ti = jnp.sum(txt * fp, axis=-1)
        sims_ii = jnp.sum(fg * fp, axis=-1)
        clip_reward = np.asarray(sims_ti + sims_ii)

        aes = np.asarray(self._aesthetic(self.aesthetic_params, l2_normalize(fp)))

        pred_ids = self._layout_ids(layout_pred, close_set=True)
        gt_ids = self._layout_ids(layout_gt, close_set=False)
        miou = compute_maximum_iou(gt_ids, pred_ids)
        laysim = compute_docsim(gt_ids, pred_ids)

        return clip_reward + aes * 0.1 + miou * 10 + laysim * 10
