"""Condition-map and keypoint datasets over synthetic fixture files."""
import json
import os

import numpy as np
import pytest

from layoutllm_t2i_tpu.data.modalities import ConditionMapDataset, KeypointDataset


@pytest.fixture
def tiny_images(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    cond_dir = tmp_path / "conds"
    img_dir.mkdir(), cond_dir.mkdir()
    for i in range(3):
        Image.fromarray((np.random.rand(24, 32, 3) * 255).astype("uint8")).save(
            img_dir / f"im{i}.jpg")
        Image.fromarray((np.random.rand(24, 32) * 255).astype("uint8")).save(
            cond_dir / f"im{i}.png")
    return str(img_dir), str(cond_dir)


def test_condition_map_dataset(tiny_images):
    img_dir, cond_dir = tiny_images
    ds = ConditionMapDataset(img_dir, cond_dir, captions={"im0": "a thing"},
                             image_size=16)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["condition"].shape == (16, 16, 3)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert 0.0 <= item["condition"].min() and item["condition"].max() <= 1.0
    assert item["caption"] == "a thing"


def test_keypoint_dataset(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((np.random.rand(64, 48, 3) * 255).astype("uint8")).save(
        img_dir / "a.jpg")
    kps = [0.0] * 51
    kps[0:3] = [24, 32, 2]    # nose visible at image center-ish
    kps[3:6] = [10, 10, 0]    # invisible
    kp_json = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 48, "height": 64}],
        "annotations": [{"image_id": 1, "num_keypoints": 1, "keypoints": kps}],
    }
    cap_json = {"annotations": [{"image_id": 1, "caption": "a person"}]}
    (tmp_path / "kp.json").write_text(json.dumps(kp_json))
    (tmp_path / "cap.json").write_text(json.dumps(cap_json))

    ds = KeypointDataset(str(img_dir), str(tmp_path / "kp.json"),
                         str(tmp_path / "cap.json"), image_size=32, max_persons=2)
    assert len(ds) == 1
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["points"].shape == (34, 2)
    assert item["masks"][0] == 1.0 and item["masks"][1] == 0.0
    assert 0 <= item["points"][0, 0] <= 1
    assert item["caption"] == "a person"
