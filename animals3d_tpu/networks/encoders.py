"""Convolutional encoders (flax.linen, NCHW call contract).

Reference: `Encoder` / `Encoder32` (`/root/reference/model/networks/encoders.py:33-89`).
Internally NHWC (TPU conv layout); the call boundary accepts NCHW to keep the
reference contract.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from animals3d_tpu.networks.mlp import get_activation


def _conv(features, kernel, stride, padding, use_bias=False, name=None):
    from animals3d_tpu.precision import compute_dtype
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=[(padding, padding), (padding, padding)],
                   use_bias=use_bias, name=name, dtype=compute_dtype(),
                   param_dtype=jnp.float32,
                   kernel_init=nn.initializers.variance_scaling(
                       1 / 3, "fan_in", "uniform"))  # ~torch conv default


class Encoder32(nn.Module):
    """32×32 feature map → vector: 3× (stride-2 conv + GroupNorm + LeakyReLU)
    then a valid 4×4 conv to 1×1 (`encoders.py:68-89`)."""
    cout: int
    nf: int = 256
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):          # x: (B, C, S, S); S=32 in the reference
        x = jnp.transpose(x, (0, 2, 3, 1))
        # stride-2 downsampling to 4x4 (3 convs for the reference's 32x32),
        # then a valid conv collapsing the rest to 1x1
        size = x.shape[1]
        i = 0
        while size > 4:
            x = _conv(self.nf, 4, 2, 1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=self.nf // 4, name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            size //= 2
            i += 1
        x = _conv(self.cout, size, 1, 0, name="conv_out")(x)
        x = get_activation(self.activation)(x)
        return x.reshape(x.shape[0], -1)


class Encoder(nn.Module):
    """Generic 64×64+ image encoder (`encoders.py:33-65`): stride-2 conv
    stack with GroupNorm/LeakyReLU down to 1×1."""
    cout: int
    nf: int = 64
    in_size: int = 128
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):          # (B, C, H, W)
        x = jnp.transpose(x, (0, 2, 3, 1))
        nf = self.nf
        size = x.shape[1]
        i = 0
        while size > 4:
            x = _conv(min(nf, 512), 4, 2, 1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(nf, 512) // 4, name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.2)
            size //= 2
            nf = min(nf * 2, 512)
            i += 1
        x = _conv(self.cout, 4, 1, 0, name="conv_out")(x)
        x = get_activation(self.activation)(x)
        return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# torchvision-architecture encoders (reference `encoders.py:91-146`:
# VGGEncoder / ResnetEncoder / ResnetDepthEncoder — exported API surface,
# unused by any shipped config). NCHW call boundary, NHWC inside.
# ---------------------------------------------------------------------------

_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16Features(nn.Module):
    """torchvision `vgg16().features`: 3×3/pad-1 convs (bias=True) + ReLU,
    2×2 max pools."""

    @nn.compact
    def __call__(self, x):                    # NHWC
        i = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = _conv(item, 3, 1, 1, use_bias=True, name=f"conv_{i}")(x)
                x = jax.nn.relu(x)
                i += 1
        return x


def _adaptive_avg_pool(x, out_hw: int):
    """AdaptiveAvgPool2d for input sizes divisible by the target (the only
    cases the reference encounters: 224² → 7², global → 1²)."""
    h, w = x.shape[1], x.shape[2]
    if h == out_hw and w == out_hw:
        return x
    assert h % out_hw == 0 and w % out_hw == 0, (h, w, out_hw)
    kh, kw = h // out_hw, w // out_hw
    return nn.avg_pool(x, (kh, kw), (kh, kw))


class VGGEncoder(nn.Module):
    """vgg16 features + 7×7 adaptive avgpool + 25088→4096→cout head
    (`encoders.py:91-106`)."""
    cout: int

    @nn.compact
    def __call__(self, x):                    # (B, 3, H, W)
        from animals3d_tpu.precision import compute_dtype
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = VGG16Features(name="features")(x)
        x = _adaptive_avg_pool(x, 7)
        # torch flattens NCHW (C-major): match before the fc
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(4096, name="linear1", dtype=compute_dtype(),
                     param_dtype=jnp.float32)(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.cout, name="linear2", dtype=compute_dtype(),
                        param_dtype=jnp.float32)(x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm pinned to its running statistics (torch `.eval()` BN).
    mean/var live in `params` (so checkpoint/convert handle one tree) but
    are excluded from optimization the same way the reference excludes
    them: these encoders are used frozen or freshly-initialized
    (stats = (0, 1)); stat *updates* are out of scope by parity."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return x * inv + (bias - mean * inv)


def _bn(name):
    return FrozenBatchNorm(name=name)


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock (two 3×3 convs + identity/1×1-proj
    skip). Running-average BN: the reference uses these encoders frozen or
    freshly-initialized (stats = (0, 1)); training-mode BN stats are out of
    scope like the reference's eval()-pinned usage."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = _conv(self.features, 3, self.stride, 1, name="conv1")(x)
        y = _bn("bn1")(y)
        y = jax.nn.relu(y)
        y = _conv(self.features, 3, 1, 1, name="conv2")(y)
        y = _bn("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _conv(self.features, 1, self.stride, 0, name="downsample")(x)
            x = _bn("downsample_bn")(x)
        return jax.nn.relu(x + y)


class ResNet18Trunk(nn.Module):
    """torchvision resnet18 minus the fc: conv1/bn/relu/maxpool + 4 stages
    of 2 BasicBlocks. Returns the dict of stage outputs (NHWC) so callers
    can tap intermediate features (the reference hooks layer2,
    `encoders.py:124-146`)."""

    @nn.compact
    def __call__(self, x):                    # NHWC
        x = _conv(64, 7, 2, 3, name="conv1")(x)
        x = _bn("bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        taps = {}
        for li, (feats, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)], start=1):
            x = BasicBlock(feats, stride, name=f"layer{li}_0")(x)
            x = BasicBlock(feats, 1, name=f"layer{li}_1")(x)
            taps[f"layer{li}"] = x
        taps["pooled"] = x.mean((1, 2))       # AdaptiveAvgPool2d((1,1))
        return taps


class ResnetEncoder(nn.Module):
    """resnet18 trunk + 512→cout linear (`encoders.py:108-115`)."""
    cout: int

    @nn.compact
    def __call__(self, x):                    # (B, 3, H, W)
        from animals3d_tpu.precision import compute_dtype
        x = jnp.transpose(x, (0, 2, 3, 1))
        pooled = ResNet18Trunk(name="resnet")(x)["pooled"]
        return nn.Dense(self.cout, name="final_linear",
                        dtype=compute_dtype(), param_dtype=jnp.float32)(pooled)


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class ResnetDepthEncoder(nn.Module):
    """resnet18 over a 3-channel depth image with ImageNet normalization;
    returns (global pooled (B, 512), layer2 local features NCHW)
    (`encoders.py:117-146`)."""

    @nn.compact
    def __call__(self, x):                    # (B, 3, H, W)
        x = jnp.transpose(x, (0, 2, 3, 1))
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(_IMAGENET_STD, x.dtype)
        taps = ResNet18Trunk(name="resnet")((x - mean) / std)
        local = jnp.transpose(taps["layer2"], (0, 3, 1, 2))
        return taps["pooled"], local
