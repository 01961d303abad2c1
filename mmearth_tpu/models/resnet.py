"""Flax ResNet-18/50 classifier baselines.

The reference's finetune CLI can build torchvision resnet18/resnet50 for
baseline comparisons against seco/gassl/satlas checkpoints
(main_finetune.py:478-501).  This is the TPU-side equivalent: standard
BasicBlock / Bottleneck ResNet, NHWC, BatchNorm with running stats.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

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
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, size in enumerate(self.stage_sizes):
            for j in range(size):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(64 * 2 ** i, strides, dtype=self.dtype, name=f"stage{i}_{j}")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def resnet18(**kwargs):
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, **kwargs)


def resnet50(**kwargs):
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, **kwargs)
