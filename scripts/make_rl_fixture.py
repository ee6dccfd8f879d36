"""Build the /tmp/rl_sd fixture for the on-chip RL run (run_r5_queue rl_onchip).

The reference RL loop (train_rl.py:116-257) trains on COCO2014 images +
sample JSONs (data.py:14-56). No COCO images ship in this container, so the
fixture takes real entries (captions, GT center-normalized boxes, labels)
from the reference's NSS1K data and pairs them with deterministic synthetic
512x512 images — the REINFORCE mechanics (rollout generate, CLIP reward,
policy gradient) are exercised identically; only the absolute reward values
are fixture-specific.

Also writes layout_cache.json (caption -> [(label, xywh-topleft box)]) so
CachedLayoutLLM serves GT layouts offline (no OpenAI dependency, SURVEY §4e).

Usage: python scripts/make_rl_fixture.py [--out /tmp/rl_sd] [--n 8]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def synth_image(rng: np.random.Generator, entry: dict, size: int = 512) -> np.ndarray:
    """Deterministic structured image: smooth background + filled GT boxes.
    Structured (not pure noise) so CLIP image features vary across examples."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack([
        0.5 + 0.4 * np.sin(2 * np.pi * (xx * rng.uniform(0.5, 2) + rng.uniform())),
        0.5 + 0.4 * np.sin(2 * np.pi * (yy * rng.uniform(0.5, 2) + rng.uniform())),
        0.5 + 0.4 * np.sin(2 * np.pi * ((xx + yy) * rng.uniform(0.5, 2))),
    ], -1)
    for (xc, yc, w, h) in entry["bbox"]:
        x0, y0 = int((xc - w / 2) * size), int((yc - h / 2) * size)
        x1, y1 = int((xc + w / 2) * size), int((yc + h / 2) * size)
        x0, y0 = max(0, x0), max(0, y0)
        base[y0:max(y0 + 1, y1), x0:max(x0 + 1, x1)] = rng.uniform(0, 1, 3)
    return (np.clip(base, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/rl_sd")
    ap.add_argument("--n", type=int, default=8, help="train AND candidate count")
    ap.add_argument("--src", default="/root/reference/data/five_category.json")
    args = ap.parse_args()

    from PIL import Image

    entries = json.load(open(args.src))
    # entries with 2-5 boxes: realistic layouts, cheap Hungarian matching
    picked = [e for e in entries if 2 <= len(e["bbox"]) <= 5][: 2 * args.n]
    assert len(picked) == 2 * args.n, f"only {len(picked)} usable entries"
    train, cand = picked[: args.n], picked[args.n:]

    img_dir = os.path.join(args.out, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    cache = {}
    for e in train + cand:
        Image.fromarray(synth_image(rng, e)).save(os.path.join(img_dir, e["name"]))
        # GT layout as the cached LLM answer, center -> top-left xywh
        # (the LLM emits top-left boxes; base_prompt.py:22-44 / utils.py:95-101)
        cache[e["captions"]] = [
            [lab, [round(b[0] - b[2] / 2, 2), round(b[1] - b[3] / 2, 2),
                   round(b[2], 2), round(b[3], 2)]]
            for lab, b in zip(e["label"], e["bbox"])
        ]

    for tag, data in (("train", train), ("candidate", cand)):
        path = os.path.join(args.out, f"train2014_{tag}_{args.n}.json")
        with open(path, "w") as f:
            json.dump({"id": [e["img_id"] for e in data], "data": data}, f)
    with open(os.path.join(args.out, "layout_cache.json"), "w") as f:
        json.dump(cache, f)
    print(f"fixture ready: {args.out} ({args.n} train / {args.n} cand, "
          f"{len(cache)} cached layouts)")


if __name__ == "__main__":
    main()
