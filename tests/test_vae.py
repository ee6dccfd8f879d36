"""VAE blocks vs torch-functional references; encode/decode round structure."""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from layoutllm_t2i_tpu.checkpoint.convert import nest_state_dict
from layoutllm_t2i_tpu.models import vae


def _t(x):
    return torch.tensor(x)


def test_resnet_block_parity(rng):
    cin, cout = 8, 16
    torch.manual_seed(0)
    sd = {
        "norm1.weight": torch.randn(cin).abs() + 0.5,
        "norm1.bias": torch.randn(cin) * 0.1,
        "conv1.weight": torch.randn(cout, cin, 3, 3) * 0.1,
        "conv1.bias": torch.randn(cout) * 0.1,
        "norm2.weight": torch.randn(cout).abs() + 0.5,
        "norm2.bias": torch.randn(cout) * 0.1,
        "conv2.weight": torch.randn(cout, cout, 3, 3) * 0.1,
        "conv2.bias": torch.randn(cout) * 0.1,
        "nin_shortcut.weight": torch.randn(cout, cin, 1, 1) * 0.1,
        "nin_shortcut.bias": torch.randn(cout) * 0.1,
    }
    x = rng.standard_normal((2, cin, 10, 10), dtype=np.float32)

    # torch-functional reference of model.py ResnetBlock semantics
    def gn(x, w, b, groups=4):
        return F.group_norm(x, groups, w, b, eps=1e-6)

    h = gn(_t(x), sd["norm1.weight"], sd["norm1.bias"])
    h = h * torch.sigmoid(h)
    h = F.conv2d(h, sd["conv1.weight"], sd["conv1.bias"], padding=1)
    h = gn(h, sd["norm2.weight"], sd["norm2.bias"])
    h = h * torch.sigmoid(h)
    h = F.conv2d(h, sd["conv2.weight"], sd["conv2.bias"], padding=1)
    sc = F.conv2d(_t(x), sd["nin_shortcut.weight"], sd["nin_shortcut.bias"])
    ref = (sc + h).numpy()

    p = nest_state_dict(sd)
    import layoutllm_t2i_tpu.ops.nn as jnn

    def our_block(p, x):
        h = jnn.group_norm(p["norm1"], x, num_groups=4, eps=1e-6)
        h = jnn.conv2d(p["conv1"], jnn.silu(h))
        h = jnn.group_norm(p["norm2"], h, num_groups=4, eps=1e-6)
        h = jnn.conv2d(p["conv2"], jnn.silu(h))
        return jnn.conv2d(p["nin_shortcut"], x, padding=0) + h

    ours = np.asarray(our_block(p, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=3e-5)


def test_vae_downsample_asymmetric_pad(rng):
    c = 4
    torch.manual_seed(1)
    w = torch.randn(c, c, 3, 3) * 0.2
    b = torch.randn(c) * 0.1
    x = rng.standard_normal((1, c, 8, 8), dtype=np.float32)
    ref = F.conv2d(F.pad(_t(x), (0, 1, 0, 1)), w, b, stride=2).numpy()
    p = nest_state_dict({"conv.weight": w, "conv.bias": b})
    ours = np.asarray(vae.vae_downsample(p, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_encode_decode_round(rng):
    cfg = vae.VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params = vae.init_vae_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    z = vae.encode(params, cfg, x, rng=jax.random.PRNGKey(1), sample=True)
    assert z.shape == (1, 8, 8, 4)
    z_mode = vae.encode(params, cfg, x, sample=False)
    assert np.isfinite(np.asarray(z_mode)).all()
    out = vae.decode(params, cfg, z)
    assert out.shape == (1, 16, 16, 3)
    # scale factor applied symmetrically: encode(sample=False) then decode of
    # the same latent is deterministic
    np.testing.assert_array_equal(
        np.asarray(vae.decode(params, cfg, z_mode)),
        np.asarray(vae.decode(params, cfg, z_mode)),
    )
