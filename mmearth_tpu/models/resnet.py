"""Flax ResNet-18/50 classifier baselines.

The reference's finetune CLI can build torchvision resnet18/resnet50 for
baseline comparisons against seco/gassl/satlas checkpoints
(main_finetune.py:478-501).  This is the TPU-side equivalent: standard
BasicBlock / Bottleneck ResNet, NHWC, BatchNorm with running stats.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (3, 3), strides=(self.strides, self.strides), padding="SAME")(x)
        y = nn.relu(norm()(y))
        y = conv(self.filters, (3, 3), padding="SAME")(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), strides=(self.strides, self.strides), name="downsample_conv")(x)
            residual = norm(name="downsample_norm")(residual)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype)
        residual = x
        y = nn.relu(norm()(conv(self.filters, (1, 1))(x)))
        y = nn.relu(norm()(conv(self.filters, (3, 3), strides=(self.strides, self.strides), padding="SAME")(y)))
        y = norm(scale_init=nn.initializers.zeros)(conv(self.filters * 4, (1, 1))(y))
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides), name="downsample_conv")(x)
            residual = norm(name="downsample_norm")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: type = BasicBlock
    num_classes: int = 1000
    in_chans: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        """``features=True`` returns the smp-style 6-level pyramid
        [identity, 1/2, 1/4, 1/8, 1/16, 1/32] for the UNet decoder (the fc
        head is then never created, like smp's headless encoders)."""
        x = x.astype(self.dtype)
        feats = [x]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="stem_norm")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, size in enumerate(self.stage_sizes):
            for j in range(size):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(64 * 2 ** i, strides, dtype=self.dtype, name=f"stage{i}_{j}")(x, train)
            feats.append(x)
        if features:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class DecoderBlock(nn.Module):
    """smp UnetDecoder block: x2 nearest upsample, skip concat, 2x
    (conv3x3 + BN + ReLU)."""

    filters: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        for k in range(2):
            x = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"conv{k}")(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     dtype=self.dtype, name=f"norm{k}")(x))
        return x


class ResNetUnet(nn.Module):
    """ResNet-encoder UNet segmentation baseline — the TPU equivalent of
    ``smp.Unet(encoder_name='resnetXX')`` (reference main_finetune.py:480-489):
    depth-5 encoder pyramid, decoder channels (256,128,64,32,16), 3x3 conv
    segmentation head at full resolution.  Linear-probe freezing trains
    decoder + head only (helpers.py:957-966)."""

    stage_sizes: Sequence[int]
    block: type = BasicBlock
    num_classes: int = 1000
    in_chans: int = 3
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = ResNet(self.stage_sizes, self.block, in_chans=self.in_chans, dtype=self.dtype)
        self.decoder = [DecoderBlock(f, dtype=self.dtype) for f in self.decoder_channels]
        self.segmentation_head = nn.Conv(self.num_classes, (3, 3), padding="SAME", dtype=self.dtype)

    def __call__(self, x, train: bool = False):
        feats = self.encoder(x, train, features=True)[::-1]
        # smp's UnetDecoder drops the identity feature (features[1:] in
        # smp.decoders.unet.decoder.UnetDecoder.forward), so the final
        # decoder block upsamples to full resolution WITHOUT a skip — the
        # raw input image is never concatenated in.
        y, skips = feats[0], list(feats[1:-1]) + [None]
        for blk, skip in zip(self.decoder, skips):
            y = blk(y, skip, train)
        return self.segmentation_head(y)


def resnet18(**kwargs):
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, **kwargs)


def resnet50(**kwargs):
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, **kwargs)


def resnet18_unet(**kwargs):
    return ResNetUnet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, **kwargs)


def resnet50_unet(**kwargs):
    return ResNetUnet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, **kwargs)


def resnet_spec(model_name: str) -> tuple[tuple[int, ...], bool]:
    """(stage_sizes, bottleneck) for a resnet model name."""
    if "50" in model_name:
        return (3, 4, 6, 3), True
    return (2, 2, 2, 2), False
