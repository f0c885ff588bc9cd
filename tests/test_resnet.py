"""ResNetFeatures vs a torch oracle with torchvision-compatible naming.

torchvision is not installed here, so the oracle reimplements the v1.5
bottleneck ResNet (stride on the 3x3 conv) with torchvision state-dict
names (layer1.0.conv1, downsample.0/1, ...), exercising the exact import
path a real torchvision resnet152 checkpoint would take."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from fancyrec_tpu.models.resnet import ResNetFeatures, preprocess_images

BLOCKS = (1, 1, 1, 1)  # stage structure check at 1/10 the compute of 152


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, width, stride):
        super().__init__()
        out = width * 4
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, out, 1, stride, bias=False),
            tnn.BatchNorm2d(out))

    def forward(self, x):
        idt = self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class TorchResNetOracle(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        inplanes, width = 64, 64
        for stage, n in enumerate(BLOCKS):
            blocks = []
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(TorchBottleneck(inplanes, width, stride))
                inplanes = width * 4
            setattr(self, "layer%d" % (stage + 1), tnn.Sequential(*blocks))
            width *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for s in range(4):
            x = getattr(self, "layer%d" % (s + 1))(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(model):
    rng = np.random.RandomState(0)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                np.abs(rng.randn(m.num_features)) + 0.5, dtype=torch.float32))
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)


def test_resnet_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchResNetOracle()
    with torch.no_grad():
        _randomize_bn_stats(oracle)
    oracle.eval()

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    model = ResNetFeatures(blocks=BLOCKS, dtype=jnp.float32)
    params = ResNetFeatures.params_from_torch(oracle.state_dict(), BLOCKS)
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_preprocess_matches_reference_transform():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (1, 8, 8, 3), np.uint8)
    got = np.asarray(preprocess_images(jnp.asarray(img)))
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    want = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow   # 18 s: compiles two full ResNet-152 stems
def test_space_to_depth_stem_equivalent():
    """stem_s2d=True is numerically identical to the plain 7x7/s2 stem."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    m_plain = ResNetFeatures(blocks=BLOCKS, dtype=jnp.float32, stem_s2d=False)
    import jax
    params = m_plain.init(jax.random.PRNGKey(0), x)["params"]
    m_s2d = ResNetFeatures(blocks=BLOCKS, dtype=jnp.float32, stem_s2d=True)
    y0 = m_plain.apply({"params": params}, x)
    y1 = m_s2d.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=2e-4, rtol=2e-4)
