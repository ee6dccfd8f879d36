"""ResNet map-grounding backbone: block parity vs torch + full forward."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from layoutllm_t2i_tpu.checkpoint.convert import nest_state_dict
from layoutllm_t2i_tpu.models.resnet import (
    ResNetConfig, _basic_block, _bottleneck, init_position_net_map_resnet,
    init_resnet_params, position_net_map_resnet, resnet_features,
)


def _torch_basic_block(cin, planes, stride):
    class Blk(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(planes)
            self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(planes)
            if stride != 1 or cin != planes:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, planes, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(planes))

        def forward(self, x):
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            idn = self.downsample(x) if hasattr(self, "downsample") else x
            return torch.relu(out + idn)
    return Blk()


def test_basic_block_matches_torch(rng):
    torch.manual_seed(0)
    blk = _torch_basic_block(8, 16, 2).eval()
    with torch.no_grad():  # non-trivial BN stats
        for bn in (blk.bn1, blk.bn2, blk.downsample[1]):
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    x = rng.standard_normal((2, 8, 12, 12)).astype(np.float32)
    with torch.no_grad():
        ref = blk(torch.tensor(x)).numpy()
    p = nest_state_dict({k: v for k, v in blk.state_dict().items()
                         if not k.endswith("num_batches_tracked")})
    ours = _basic_block(p, jnp.asarray(x.transpose(0, 2, 3, 1)), stride=2)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_resnet18_forward_shape(rng):
    cfg = ResNetConfig()
    params = init_resnet_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = resnet_features(params, cfg, x)
    assert out.shape == (1, 2, 2, 512)   # /32 spatial, 512 channels
    assert np.isfinite(np.asarray(out)).all()


def test_resnet50_bottleneck_shapes(rng):
    cfg = ResNetConfig(block="bottleneck", layers=(1, 1, 1, 1))
    params = init_resnet_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = resnet_features(params, cfg, x)
    assert out.shape == (1, 2, 2, 2048)


def test_position_net_map_resnet(rng):
    cfg = ResNetConfig(layers=(1, 1, 1, 1))
    p = init_position_net_map_resnet(jax.random.PRNGKey(0), out_dim=32,
                                     resize_input=64, cfg=cfg)
    cmap = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    mask = jnp.asarray([1.0, 0.0])
    objs = position_net_map_resnet(p, cmap, mask, resize_input=64, cfg=cfg)
    assert objs.shape == (2, 4, 32)   # (64/32)^2 tokens
    assert np.isfinite(np.asarray(objs)).all()
