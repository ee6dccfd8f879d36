"""End-to-end modality paths through the gligen_inference CLI
(reference gligen_inference.py:199-342 dispatches 10 modality demos)."""
import numpy as np
import pytest
from PIL import Image

from layoutllm_t2i_tpu.cli.gligen_inference import main


def _png(path, hw=(32, 32)):
    arr = (np.random.default_rng(0).uniform(0, 255, hw + (3,))).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return str(path)


@pytest.mark.slow
def test_map_modality_cli(tmp_path):
    edge = _png(tmp_path / "edge.png")
    main(["--prompt", "a dog", "--small", "--modality", "canny",
          "--map_path", edge, "--folder", str(tmp_path / "out"), "--seed", "1"])
    assert (tmp_path / "out" / "sample_0.png").exists()


@pytest.mark.slow
def test_keypoint_modality_cli(tmp_path):
    kp = ";".join(f"0.{i % 9 + 1},0.{(i * 3) % 9 + 1}" for i in range(17))
    main(["--prompt", "a person", "--small", "--modality", "keypoint",
          "--keypoints", kp, "--folder", str(tmp_path / "out"), "--seed", "1"])
    assert (tmp_path / "out" / "sample_0.png").exists()


@pytest.mark.slow
def test_text_image_modality_cli(tmp_path):
    ref = _png(tmp_path / "ref.png")
    main(["--prompt", "a dog next to a cat", "--small", "--modality",
          "text_image", "--layout",
          "dog:[0.1,0.1,0.4,0.4];cat:[0.5,0.5,0.4,0.4]",
          "--image_refs", f"{ref};-", "--folder", str(tmp_path / "out"),
          "--seed", "1"])
    assert (tmp_path / "out" / "sample_0.png").exists()


def test_modality_arg_validation(tmp_path):
    with pytest.raises(AssertionError, match="--map_path"):
        main(["--prompt", "x", "--small", "--modality", "canny"])
    with pytest.raises(AssertionError, match="--layout"):
        main(["--prompt", "x", "--small"])
    with pytest.raises(AssertionError, match="--image_refs"):
        main(["--prompt", "x", "--small", "--modality", "text_image",
              "--layout", "dog:[0.1,0.1,0.4,0.4]"])
    with pytest.raises(SystemExit, match="keypoints"):
        main(["--prompt", "x", "--small", "--modality", "keypoint",
              "--keypoints", "garbage"])
