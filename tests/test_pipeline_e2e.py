"""End-to-end smoke: tiny random models through the full inference pipeline,
the RL REINFORCE loop with a stubbed LLM, and inpainting masks. All offline
(SURVEY.md §4e)."""
import json

import numpy as np
import jax
import pytest

from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline, images_to_uint8
from layoutllm_t2i_tpu.pipeline.loaders import random_models


@pytest.fixture(scope="module")
def pipe():
    models = random_models(small=True)
    return InferencePipeline(models, steps=4, sampler="plms", guidance_scale=7.5,
                             alpha_type=(0.3, 0.0, 0.7))


def test_generate_shapes_and_determinism(pipe):
    prompts = ["a cat on a table", "a dog in a park"]
    layouts = [([[0.1, 0.1, 0.6, 0.6]], ["cat"]), ([[0.2, 0.2, 0.9, 0.9]], ["dog"])]
    imgs = pipe.generate(prompts, layouts, seed=7)
    assert imgs.shape == (2, 16, 16, 3)  # tiny vae: 8 latent * 2 ch_mult levels
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1
    imgs2 = pipe.generate(prompts, layouts, seed=7)
    np.testing.assert_array_equal(imgs, imgs2)
    assert images_to_uint8(imgs).dtype == np.uint8


def test_generate_empty_layout_ok(pipe):
    imgs = pipe.generate(["an empty scene"], [([], [])])
    assert np.isfinite(imgs).all()


def test_relations_change_output(pipe):
    # the rela_fuse gates init to zero (alpha_attn=0 -> tanh=0), matching the
    # reference; open one gate so the relation pathway is observable
    import jax.numpy as jnp

    models = pipe.models
    blk = models.unet_params["input_blocks"]["1"]["1"]["transformer_blocks"]["0"]
    old = blk["rela_fuse"]["alpha_attn"]
    blk["rela_fuse"]["alpha_attn"] = jnp.asarray(1.0)
    p2 = InferencePipeline(models, steps=3, sampler="plms", guidance_scale=7.5)
    try:
        prompts = ["a dog chasing a cat"]
        layouts = [([[0.1, 0.1, 0.5, 0.5], [0.5, 0.5, 0.9, 0.9]], ["dog", "cat"])]
        a = p2.generate(prompts, layouts, relation_texts=[["dog chase cat"]], seed=3)
        b = p2.generate(prompts, layouts, relation_texts=[None], seed=3)
        assert not np.array_equal(a, b)
    finally:
        blk["rela_fuse"]["alpha_attn"] = old


def test_ddim_pipeline(pipe):
    p2 = InferencePipeline(pipe.models, steps=5, sampler="ddim", guidance_scale=7.5,
                           alpha_type=(0.3, 0.0, 0.7))
    imgs = p2.generate(["x"], [([[0.2, 0.2, 0.8, 0.8]], ["thing"])])
    assert np.isfinite(imgs).all()


def test_rl_trainer_smoke(tmp_path, pipe):
    from layoutllm_t2i_tpu.training.rl_trainer import RLConfig, RLTrainer
    from layoutllm_t2i_tpu.utils.logging import Logger

    examples = [
        {"captions": f"caption {i}", "name": f"img{i}.jpg",
         "bbox": [[0.5, 0.5, 0.2, 0.2]], "label": ["dog"]}
        for i in range(4)
    ]

    def fake_llm(prompt):
        # match the QUERY caption (last 'input:' line), not the in-context
        # shots, which can also contain 'caption 1'
        query = prompt.rsplit("input:", 1)[-1]
        if "caption 1" in query:    # unparseable -> row dropped, batch padded
            return "no layout here"
        return "output:\ndog: [0.30, 0.30, 0.40, 0.40]"

    class FakeReward:
        def __call__(self, captions, imgs_pred, imgs_gt, lp, lg):
            return np.ones(len(captions), dtype=np.float32)

    gen_calls = []

    def generate_fn(captions, layouts, seed=None):
        gen_calls.append((len(captions), seed))
        return np.zeros((len(captions), 16, 16, 3), np.float32)

    class Batches:
        def __iter__(self):
            imgs = np.zeros((2, 16, 16, 3), np.float32)
            yield examples[:2], imgs, [0, 1]
            yield examples[2:], imgs, [2, 3]

    feats = np.random.default_rng(0).standard_normal((4, 32), dtype=np.float32)
    cfg = RLConfig(epochs=2, batch_size=2, shot_number=2, lr=1e-2,
                   embedding_size=8, in_dim=32, ckpt_path=str(tmp_path))
    tr = RLTrainer(cfg, FakeReward(), generate_fn, fake_llm, examples, examples,
                   feats, feats, Batches(),
                   logger=Logger(str(tmp_path / "log.txt")))
    p0 = np.asarray(tr.params["linear"]["weight"]).copy()
    history = tr.train()
    assert len(history["total_reward_history"]) == 2
    assert (tmp_path / "history.json").exists()
    assert (tmp_path / "ckpt_best_reward.pkl").exists()
    assert not np.array_equal(p0, np.asarray(tr.params["linear"]["weight"]))
    # RL fidelity: fresh noise per rollout batch (distinct seeds) and
    # power-of-two generation buckets (the jitted PLMS program compiles at
    # most log2(B)+1 signatures even when predictions are dropped): batches
    # with one parseable row pad to bucket 1, full batches to 2
    seeds = [s for _, s in gen_calls]
    assert len(set(seeds)) == len(seeds) and None not in seeds
    assert [b for b, _ in gen_calls] == [1, 2, 1, 2]
    # resume path
    cfg2 = RLConfig(epochs=1, batch_size=2, shot_number=2, embedding_size=8,
                    in_dim=32, ckpt_path=str(tmp_path), resume=str(tmp_path))
    tr2 = RLTrainer(cfg2, FakeReward(), generate_fn, fake_llm, examples, examples,
                    feats, feats, Batches(),
                    logger=Logger(str(tmp_path / "log2.txt")))
    assert tr2.start_epoch == 2


def test_rl_policy_pt_roundtrip(tmp_path):
    """VERDICT r4 missing #3: a policy trained here must feed the reference —
    ckpt_E.pt / state_E.pt in the torch layout of train_rl.py:218-222.
    Train 1 epoch -> reload via convert.load_policy -> bit-match; resume
    from the .pt pair alone -> exact optax state; and the state file loads
    into an actual torch.optim.Adam (the reference's resume consumer)."""
    torch = pytest.importorskip("torch")
    from layoutllm_t2i_tpu.checkpoint.convert import load_policy, load_policy_state
    from layoutllm_t2i_tpu.checkpoint.export import _find_adam_state
    from layoutllm_t2i_tpu.training.rl_trainer import RLConfig, RLTrainer
    from layoutllm_t2i_tpu.utils.logging import Logger

    examples = [
        {"captions": f"caption {i}", "name": f"img{i}.jpg",
         "bbox": [[0.5, 0.5, 0.2, 0.2]], "label": ["dog"]}
        for i in range(4)
    ]
    fake_llm = lambda prompt: "output:\ndog: [0.30, 0.30, 0.40, 0.40]"  # noqa: E731
    reward = lambda c, ip, ig, lp, lg: np.ones(len(c), np.float32)  # noqa: E731
    gen = lambda c, l, seed=None: np.zeros((len(c), 16, 16, 3), np.float32)  # noqa: E731

    class Batches:
        def __iter__(self):
            imgs = np.zeros((2, 16, 16, 3), np.float32)
            yield examples[:2], imgs, [0, 1]
            yield examples[2:], imgs, [2, 3]

    feats = np.random.default_rng(1).standard_normal((4, 32), dtype=np.float32)
    cfg = RLConfig(epochs=1, batch_size=2, shot_number=2, lr=1e-2,
                   embedding_size=8, in_dim=32, ckpt_path=str(tmp_path))
    tr = RLTrainer(cfg, reward, gen, fake_llm, examples, examples,
                   feats, feats, Batches(),
                   logger=Logger(str(tmp_path / "log.txt")))
    tr.train()

    # reference-format files exist alongside the native pkl
    assert (tmp_path / "ckpt_0.pt").exists()
    assert (tmp_path / "state_0.pt").exists()
    assert (tmp_path / "ckpt_best_reward.pt").exists()

    # ckpt_E.pt -> convert.load_policy bit-matches the live params
    re_params = load_policy(str(tmp_path / "ckpt_0.pt"))
    np.testing.assert_array_equal(
        np.asarray(tr.params["linear"]["weight"]),
        re_params["linear"]["weight"])
    np.testing.assert_array_equal(
        np.asarray(tr.params["linear"]["bias"]), re_params["linear"]["bias"])
    # the raw state_dict has the torch (out,in) weight layout
    raw = torch.load(str(tmp_path / "ckpt_0.pt"), weights_only=False)
    assert tuple(raw["weight"].shape) == (8, 32)

    # state_E.pt moments round-trip exactly
    st = load_policy_state(str(tmp_path / "state_0.pt"))
    adam = _find_adam_state(tr.opt_state)
    assert st["step"] == int(np.asarray(adam.count)) and st["last_epoch"] == 0
    for leaf_ours, leaf_rt in zip(
            jax.tree.leaves(adam.mu) + jax.tree.leaves(adam.nu),
            jax.tree.leaves(st["mu"]) + jax.tree.leaves(st["nu"])):
        np.testing.assert_array_equal(np.asarray(leaf_ours), leaf_rt)

    # resume from the .pt pair ALONE reconstructs the exact optax state
    for pkl in tmp_path.glob("*.pkl"):
        pkl.unlink()
    cfg2 = RLConfig(epochs=1, batch_size=2, shot_number=2, lr=1e-2,
                    embedding_size=8, in_dim=32, ckpt_path=str(tmp_path),
                    resume=str(tmp_path))
    tr2 = RLTrainer(cfg2, reward, gen, fake_llm, examples, examples,
                    feats, feats, Batches(),
                    logger=Logger(str(tmp_path / "log2.txt")))
    assert tr2.start_epoch == 1
    adam2 = _find_adam_state(tr2.opt_state)
    np.testing.assert_array_equal(np.asarray(adam.count), np.asarray(adam2.count))
    for a, b in zip(jax.tree.leaves((adam.mu, adam.nu)),
                    jax.tree.leaves((adam2.mu, adam2.nu))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the reference consumer: torch Adam over an equivalent nn.Linear accepts
    # the optimizer state_dict (train_rl.py:104-107 load path)
    lin = torch.nn.Linear(32, 8)
    opt = torch.optim.Adam(lin.parameters(), lr=1e-2)
    saved = torch.load(str(tmp_path / "state_0.pt"), weights_only=False)
    opt.load_state_dict(saved["optimizer"])
    assert float(opt.state_dict()["state"][0]["step"]) == float(st["step"])


def test_inpaint_masks():
    from layoutllm_t2i_tpu.pipeline.inpaint import draw_masks_from_boxes

    boxes = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    m = draw_masks_from_boxes(boxes, size=64)
    assert m.shape == (1, 64, 64, 1)
    assert m[0, 40, 40, 0] == 0 and m[0, 2, 2, 0] == 1
    # ~25% masked
    assert 0.2 < 1 - m.mean() < 0.3
    mr = draw_masks_from_boxes(boxes, size=64, randomize_fg_mask=True,
                               random_add_bg_mask=True, seed=1)
    assert mr.shape == (1, 64, 64, 1)


def test_vae_chunked_decode_matches(pipe):
    """vae_chunk decodes the batch in lax.map chunks (peak-HBM cap for large
    generation batches); output must equal the whole-batch decode."""
    prompts = ["a cat", "a dog", "a bird", "a fish"]
    layouts = [([[0.1, 0.1, 0.6, 0.6]], ["x"])] * 4
    chunked = InferencePipeline(pipe.models, steps=3, sampler="plms",
                                guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                                vae_chunk=2)
    whole = InferencePipeline(pipe.models, steps=3, sampler="plms",
                              guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    a = chunked.generate(prompts, layouts, seed=3)
    b = whole.generate(prompts, layouts, seed=3)
    np.testing.assert_allclose(a, b, atol=1e-5)
