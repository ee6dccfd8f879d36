"""Data pipeline: TSV round-trip, concat mapping, COCO box remap, ckpt grow."""
import json
import os

import numpy as np

from layoutllm_t2i_tpu.data.tsv import TSVFile, create_lineidx, tsv_merge, tsv_split
from layoutllm_t2i_tpu.data.concat import ConcatDataset
from layoutllm_t2i_tpu.data.coco import center_crop_params, remap_box_xywh
from layoutllm_t2i_tpu.checkpoint.tools import grow_first_conv


def test_tsvfile_roundtrip(tmp_path):
    p = tmp_path / "data.tsv"
    rows = [["id%d" % i, json.dumps({"caption": f"c{i}"}), "payload%d" % i] for i in range(5)]
    p.write_text("\n".join("\t".join(r) for r in rows) + "\n")
    tsv = TSVFile(str(p))
    assert len(tsv) == 5
    assert tsv[0] == rows[0]
    assert tsv[4] == rows[4]
    assert os.path.exists(tmp_path / "data.lineidx")


def test_tsv_split_merge(tmp_path):
    p = tmp_path / "d.tsv"
    p.write_text("\n".join(f"r{i}\tx\ty" for i in range(7)) + "\n")
    shards = tsv_split(str(p), 3, str(tmp_path / "shards"))
    assert len(shards) == 3
    merged = tsv_merge(shards, str(tmp_path / "merged.tsv"))
    out = TSVFile(merged)
    assert len(out) == 7
    assert out[6][0] == "r6"


def test_concat_dataset_repeats():
    a, b = [1, 2], [3]
    ds = ConcatDataset([a, b], repeats=[2, 3])
    assert ds.total_images() == 2 * 2 + 1 * 3
    vals = [ds[i] for i in range(len(ds))]
    assert vals == [1, 2, 1, 2, 3, 3, 3]


def test_coco_box_remap():
    # 640x480 image -> 512 crop: scale=512/480, crop_x=(683-512)//2
    scale, cx, cy = center_crop_params(640, 480, 512)
    assert cy == 0 and cx > 0
    box = remap_box_xywh([0, 0, 640, 480], scale, cx, cy, 512, flip=False)
    assert box[0] == 0.0 and box[3] == 1.0  # full-image box clamps to crop
    # flip mirrors x
    left = remap_box_xywh([0, 0, 100, 480], scale, cx, cy, 512, flip=True)
    assert left[2] == 1.0  # now on the right edge
    # degenerate after crop -> None
    assert remap_box_xywh([0, 0, 1, 1], scale, cx, cy, 512, flip=False) is None


def test_grow_first_conv():
    params = {"input_blocks": {"0": {"0": {
        "weight": np.ones((3, 3, 4, 8), np.float32),
        "bias": np.zeros((8,), np.float32)}}}}
    out = grow_first_conv(params, 5)
    w = out["input_blocks"]["0"]["0"]["weight"]
    assert w.shape == (3, 3, 9, 8)
    assert (w[:, :, :4] == 1).all() and (w[:, :, 4:] == 0).all()


def test_dataset_catalog_registrations(tmp_path):
    """Catalog mirrors the reference registry names (catalog.py:3-149) and
    actually builds datasets."""
    from PIL import Image
    import numpy as _np

    from layoutllm_t2i_tpu.data.concat import DATASET_CATALOG, build_datasets

    expected = {
        "VGGrounding", "FlickrGrounding", "SBUGrounding", "CC3MGrounding",
        "CC12MGrounding", "Obj365Detection", "CC3MGroundingHed",
        "CC3MGroundingCanny", "CC3MGroundingDepth", "DIODENormal",
        "ADESemantic", "COCO2017Keypoint", "COCO2014Layout", "COCOKeypoint",
    }
    assert expected <= set(DATASET_CATALOG)

    img_dir = tmp_path / "imgs"
    cond_dir = tmp_path / "maps"
    img_dir.mkdir()
    cond_dir.mkdir()
    arr = (_np.random.default_rng(0).uniform(0, 255, (32, 32, 3))).astype("uint8")
    Image.fromarray(arr).save(img_dir / "a.png")
    Image.fromarray(arr[:, :, 0]).save(cond_dir / "a.png")

    (ds,) = build_datasets(
        {"DIODENormal": dict(image_dir=str(img_dir), condition_dir=str(cond_dir),
                             image_size=32)},
        ROOT=str(tmp_path),
    )
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)


def test_prefetch_loader(tmp_path):
    """Background-prefetched, epoch-shuffled, process-sharded batches."""
    import numpy as _np

    from layoutllm_t2i_tpu.data.loader import PrefetchLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": _np.full((2,), i, _np.float32), "name": f"i{i}"}

    loader = PrefetchLoader(DS(), batch_size=3, seed=0, num_workers=2)
    it = iter(loader)
    seen = []
    for _ in range(6):   # spans two epochs (3 full batches per epoch)
        b = next(it)
        assert b["x"].shape == (3, 2)
        assert len(b["name"]) == 3
        seen.append(tuple(int(v) for v in b["x"][:, 0]))
    # epoch 1 covers 9 distinct indices across its 3 batches
    epoch1 = {i for batch in seen[:3] for i in batch}
    assert len(epoch1) == 9

    # two processes see disjoint shards of the same epoch
    l0 = PrefetchLoader(DS(), batch_size=2, seed=0, process_index=0,
                        process_count=2)
    l1 = PrefetchLoader(DS(), batch_size=2, seed=0, process_index=1,
                        process_count=2)
    b0 = l0._epoch_batches(0)
    b1 = l1._epoch_batches(0)
    s0 = {i for b in b0 for i in b}
    s1 = {i for b in b1 for i in b}
    assert not (s0 & s1) and len(s0) == len(s1) == 4
