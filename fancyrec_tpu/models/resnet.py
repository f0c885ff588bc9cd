"""ResNet-152 feature extractor, TPU-first.

The reference extracts 2048-d per-frame features with torchvision's
pretrained resnet152 truncated after avgpool (preprocess/resnet152.py:6-23,
extract_frame_feature.py:14-48). This is a from-scratch inference-mode
implementation built for the MXU:

  * bfloat16 activations/weights end-to-end (params kept f32, cast at use);
  * BatchNorm folded to a per-channel affine (inference semantics), which
    XLA fuses into the surrounding convs -- no separate normalization pass;
  * NHWC layout (TPU-native);
  * one jittable function over a fixed batch: images (B, 224, 224, 3) ->
    features (B, 2048).

Weight import: params_from_torch maps a torchvision resnet152 state dict
(incl. running stats -> folded affine) so extracted features are
numerically equivalent to the reference pipeline's.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

RESNET152_BLOCKS = (3, 8, 36, 3)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class AffineBN(nn.Module):
    """Inference BatchNorm: y = x * scale + bias with folded running stats."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def _conv(features, kernel, strides, name, dtype):
    return nn.Conv(features, (kernel, kernel), (strides, strides),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   dtype=dtype, name=name)


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck: stride lives on the 3x3 conv."""

    width: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = self.width * 4
        identity = x
        y = _conv(self.width, 1, 1, "conv1", self.dtype)(x)
        y = nn.relu(AffineBN(self.width, self.dtype, name="bn1")(y))
        y = _conv(self.width, 3, self.stride, "conv2", self.dtype)(y)
        y = nn.relu(AffineBN(self.width, self.dtype, name="bn2")(y))
        y = _conv(out, 1, 1, "conv3", self.dtype)(y)
        y = AffineBN(out, self.dtype, name="bn3")(y)
        if self.downsample:
            identity = _conv(out, 1, self.stride, "down_conv", self.dtype)(x)
            identity = AffineBN(out, self.dtype, name="down_bn")(identity)
        return nn.relu(y + identity)


class _StemKernel(nn.Module):
    """Holds the 7x7x3x64 stem kernel under the torchvision-compatible
    param path conv1/kernel, independent of which stem path consumes it."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


class ResNetFeatures(nn.Module):
    """images (B, H, W, 3) float -> (B, 2048) features (post-avgpool).

    stem_s2d: space-to-depth stem (the classic TPU ResNet trick): the
    7x7/stride-2 conv over 3 channels badly underfills the MXU's 128-lane
    input axis, so the input is rearranged into 2x2 blocks (12 channels)
    and the kernel zero-padded to 8x8 and folded to 4x4x12 -- numerically
    identical output (verified to 1e-5 in tests), better lane utilization.
    """

    blocks: Sequence[int] = RESNET152_BLOCKS
    dtype: Any = jnp.bfloat16
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        kernel = _StemKernel(name="conv1")().astype(self.dtype)
        if self.stem_s2d:
            b, h, w, _ = x.shape
            # kernel: zero tap row/col at the top-left -> (8,8,3,64) -> (4,4,12,64)
            kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
            kt = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
            kt = kt.reshape(4, 4, 12, 64)
            # input: pad to coords -4..H+3, then 2x2 blocks -> 12 channels
            xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
            xt = xp.reshape(b, (h + 8) // 2, 2, (w + 8) // 2, 2, 3)
            xt = xt.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, (h + 8) // 2, (w + 8) // 2, 12)
            x = jax.lax.conv_general_dilated(
                xt, kt, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)[:, : h // 2, : w // 2]
        else:
            x = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=self.dtype)
        x = nn.relu(AffineBN(64, self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        width = 64
        for stage, n_blocks in enumerate(self.blocks):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(width, stride=stride,
                               downsample=(b == 0), dtype=self.dtype,
                               name="layer%d_%d" % (stage + 1, b))(x)
            width *= 2
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)

    # ------------------------------------------------------------------
    @staticmethod
    def params_from_torch(sd: Dict[str, Any], blocks=RESNET152_BLOCKS,
                          eps: float = 1e-5) -> dict:
        """torchvision resnet152 state dict -> our folded-BN param tree."""

        def arr(k):
            try:
                return sd[k].detach().cpu().numpy()
            except AttributeError:
                return np.asarray(sd[k])

        def conv(k):
            # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
            return {"kernel": np.transpose(arr(k + ".weight"), (2, 3, 1, 0))}

        def bn(k):
            gamma, beta = arr(k + ".weight"), arr(k + ".bias")
            mean, var = arr(k + ".running_mean"), arr(k + ".running_var")
            scale = gamma / np.sqrt(var + eps)
            return {"scale": scale, "bias": beta - mean * scale}

        params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
        for stage, n_blocks in enumerate(blocks):
            for b in range(n_blocks):
                p = "layer%d.%d." % (stage + 1, b)
                blk = {
                    "conv1": conv(p + "conv1"), "bn1": bn(p + "bn1"),
                    "conv2": conv(p + "conv2"), "bn2": bn(p + "bn2"),
                    "conv3": conv(p + "conv3"), "bn3": bn(p + "bn3"),
                }
                if b == 0:
                    blk["down_conv"] = conv(p + "downsample.0")
                    blk["down_bn"] = bn(p + "downsample.1")
                params["layer%d_%d" % (stage + 1, b)] = blk
        return params


def preprocess_images(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """(B, 224, 224, 3) uint8 -> normalized float (ImageNet stats).

    Matches the reference transform minus its RandomHorizontalFlip -- a
    train-time augmentation the reference mistakenly applies during feature
    extraction (preprocess/mydataset.py:23, nondeterministic features);
    dropped deliberately, see SURVEY.md quirk list #6.
    """
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def make_extractor(params, batch_size: int = 128, dtype=jnp.bfloat16,
                   stem_s2d: bool = True):
    """-> jitted fn: uint8 images (B, 224, 224, 3) -> (B, 2048) f32."""
    model = ResNetFeatures(dtype=dtype, stem_s2d=stem_s2d)

    @jax.jit
    def extract(images):
        return model.apply({"params": params}, preprocess_images(images))

    return extract


def init_random_params(key=None, dtype=jnp.bfloat16) -> dict:
    model = ResNetFeatures(dtype=dtype)  # param tree identical for both stems
    key = key if key is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    return model.init(key, dummy)["params"]
