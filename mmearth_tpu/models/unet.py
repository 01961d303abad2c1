"""ConvNeXtV2-UNet for GEO-Bench segmentation finetuning.

NHWC rebuild of the reference decoder model (models/convnextv2_unet.py:68-275):
encoder = ConvNeXtV2 trunk saving skip features (initial_conv out, stem out,
stage-1 out, stage-2 out; :223-243); decoder = four UpsampleBlocks
(nearest-upsample + 3x3 conv + LN + GELU, :52-65) with skip concatenation, a
final upsample by patch_size/8, ``initial_conv_upsample`` (:171-211), and a
1x1 conv head at dims[0]/2 channels (:159).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .convnextv2 import Block, gelu, init_normal02
from .norm import LayerNorm

Dtype = Any


def nearest_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    if scale == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


class UpsampleBlock(nn.Module):
    out_dim: int
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample(x, self.scale)
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", kernel_init=init_normal02,
                    dtype=self.dtype, name="conv")(x)
        x = LayerNorm(self.out_dim, dtype=self.dtype, name="norm")(x)
        return gelu(x)


class ConvNeXtV2Unet(nn.Module):
    patch_size: int = 16
    img_size: int = 112
    in_chans: int = 3
    num_classes: int = 1000
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    head_init_scale: float = 1.0
    use_orig_stem: bool = False
    dtype: Dtype = jnp.float32

    @property
    def stem_stride(self) -> int:
        return self.patch_size // (2 ** (len(self.depths) - 1))

    def setup(self):
        d0 = self.dims[0]
        if self.use_orig_stem:
            self.stem_orig_conv = nn.Conv(
                d0, (self.stem_stride, self.stem_stride),
                strides=(self.stem_stride, self.stem_stride), padding="VALID",
                kernel_init=init_normal02, dtype=self.dtype,
            )
            self.stem_orig_norm = LayerNorm(d0, dtype=self.dtype)
        else:
            self.initial_conv_conv = nn.Conv(d0, (3, 3), padding="SAME",
                                             kernel_init=init_normal02, dtype=self.dtype)
            self.initial_conv_norm = LayerNorm(d0, dtype=self.dtype)
            s = self.stem_stride
            self.stem_conv = nn.Conv(d0, (s, s), strides=(s, s), padding="VALID",
                                     feature_group_count=d0,
                                     kernel_init=init_normal02, dtype=self.dtype)
            self.stem_norm = LayerNorm(d0, dtype=self.dtype)

        self.downsample_norms = [LayerNorm(self.dims[i], dtype=self.dtype) for i in range(3)]
        self.downsample_convs = [
            nn.Conv(self.dims[i + 1], (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=init_normal02, dtype=self.dtype)
            for i in range(3)
        ]
        dp_rates = [float(r) for r in np.linspace(0.0, self.drop_path_rate, sum(self.depths))]
        stages = []
        cur = 0
        for i, depth in enumerate(self.depths):
            stages.append([
                Block(self.dims[i], drop_path=dp_rates[cur + j], sparse=False, dtype=self.dtype)
                for j in range(depth)
            ])
            cur += depth
        self.stages = stages

        # decoder: upsample_layers[k] for k=0..3 maps i=3..0 (reference
        # convnextv2_unet.py:165-217)
        ups = [UpsampleBlock(self.dims[3] // 2, 2, dtype=self.dtype)]
        ups.append(UpsampleBlock(self.dims[2] // 2, 2, dtype=self.dtype))
        ups.append(UpsampleBlock(self.dims[1] // 2, 2, dtype=self.dtype))
        ups.append(UpsampleBlock(self.dims[0], self.stem_stride, dtype=self.dtype))
        self.upsample_layers = ups
        self.initial_conv_upsample_conv = nn.Conv(
            self.dims[0] // 2, (3, 3), padding="SAME", kernel_init=init_normal02, dtype=self.dtype
        )
        self.initial_conv_upsample_norm = LayerNorm(self.dims[0] // 2, dtype=self.dtype)
        self.head = nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=lambda key, shape, dtype: init_normal02(key, shape, dtype) * self.head_init_scale,
            dtype=self.dtype,
        )

    def encoder(self, x, deterministic=True):
        feats = []
        if self.use_orig_stem:
            x = self.stem_orig_norm(self.stem_orig_conv(x))
            feats.append(x)
        else:
            x = self.initial_conv_conv(x)
            x = gelu(self.initial_conv_norm(x))
            feats.append(x)
            x = self.stem_norm(self.stem_conv(x))
            feats.append(x)
        for blk in self.stages[0]:
            x = blk(x, None, deterministic)
        for i in range(3):
            x = self.downsample_convs[i](self.downsample_norms[i](x))
            for blk in self.stages[i + 1]:
                x = blk(x, None, deterministic)
            if i < 2:
                feats.append(x)
        return x, feats

    def decoder(self, x, feats):
        for i in range(3):
            x = self.upsample_layers[i](x)
            x = jnp.concatenate([x, feats.pop()], axis=-1)
        x = self.upsample_layers[3](x)
        if not self.use_orig_stem:
            x = jnp.concatenate([x, feats.pop()], axis=-1)
        x = self.initial_conv_upsample_conv(x)
        x = gelu(self.initial_conv_upsample_norm(x))
        return x

    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x, feats = self.encoder(x, deterministic)
        x = self.decoder(x, feats)
        return self.head(x)  # (N, H, W, num_classes)


def _factory(depths, dims):
    def build(**kwargs):
        kwargs.setdefault("depths", depths)
        kwargs.setdefault("dims", dims)
        return ConvNeXtV2Unet(**kwargs)

    return build


convnextv2_unet_atto = _factory((2, 2, 6, 2), (40, 80, 160, 320))
convnextv2_unet_femto = _factory((2, 2, 6, 2), (48, 96, 192, 384))
convnextv2_unet_pico = _factory((2, 2, 6, 2), (64, 128, 256, 512))
convnextv2_unet_nano = _factory((2, 2, 8, 2), (80, 160, 320, 640))
convnextv2_unet_tiny = _factory((3, 3, 9, 3), (96, 192, 384, 768))
convnextv2_unet_base = _factory((3, 3, 27, 3), (128, 256, 512, 1024))
convnextv2_unet_large = _factory((3, 3, 27, 3), (192, 384, 768, 1536))
convnextv2_unet_huge = _factory((3, 3, 27, 3), (352, 704, 1408, 2816))
