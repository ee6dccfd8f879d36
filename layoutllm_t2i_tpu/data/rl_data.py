"""RL training data: COCO2014 sample/candidate JSON files + images.

Reference: data.py:14-56 and the JSON schema of data/train2014_train_{N}.json:
{"id": [...], "data": [{img_id, name, width, height, bbox (center-normalized
xcycwh), label, captions}, ...]}. Images are resized to 512x512 RGB float
[0, 1] (the reference keeps PIL images; we keep arrays for the jitted CLIP
reward).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def load_rl_data(sampled_data_dir: str, train_number: int, cand_number: int):
    """(train_examples, cand_examples, train_ids, cand_ids)."""
    train = load_json(os.path.join(sampled_data_dir, f"train2014_train_{train_number}.json"))
    cand = load_json(os.path.join(sampled_data_dir, f"train2014_candidate_{cand_number}.json"))
    return train["data"], cand["data"], train["id"], cand["id"]


def load_image(img_dir: str, name: str, size: int = 512) -> np.ndarray:
    from PIL import Image

    img = Image.open(os.path.join(img_dir, name)).convert("RGB").resize((size, size))
    return np.asarray(img, dtype=np.float32) / 255.0


class RLBatches:
    """Sequential batches over the train examples (the reference DataLoader
    uses shuffle=False, train_rl.py:134-140)."""

    def __init__(self, examples: List[Dict], img_dir: str, batch_size: int):
        self.examples = examples
        self.img_dir = img_dir
        self.batch_size = batch_size

    def __iter__(self):
        for i in range(0, len(self.examples), self.batch_size):
            chunk = self.examples[i : i + self.batch_size]
            imgs = np.stack([load_image(self.img_dir, ex["name"]) for ex in chunk])
            yield chunk, imgs, list(range(i, i + len(chunk)))

    def __len__(self):
        return (len(self.examples) + self.batch_size - 1) // self.batch_size
