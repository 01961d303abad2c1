"""FCMAE — Fully Convolutional Masked Autoencoder, multi-modal (MP-MAE).

TPU-native rebuild of the reference model (models/fcmae.py:27-456):

  * encoder: NHWC ConvNeXtV2 with the sparse-equivalent masked path
    (``sparse=True``) or the reference's leaky dense path.
  * 1x1 projection to the decoder dim (fcmae.py:113-115), learnable mask token
    (:118) blended into masked sites (:252-255).
  * decoder: the reference builds one list of Blocks and registers the *same
    instances* under every modality name (fcmae.py:119-137), so the decoder
    parameters are shared across modalities and each per-modality decode
    computes the identical features.  We therefore run the shared decoder
    stack once and fan out only the per-modality prediction heads — identical
    math, ~12x less decoder compute.
  * heads: 1x1 conv to p^2*C for pixel modalities; shared LN + GAP + Linear
    for image-level modalities (fcmae.py:138-151, 256-265).
  * random mask via randn + double argsort (fcmae.py:214-231).

The batch random crop (kornia in the reference, fcmae.py:418-434) lives in
``aligned_random_crop`` and is applied inside the jitted train step.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import modalities as M
from ..losses.multipretext import multipretext_loss, uncertainty_weighted, unweighted
from .convnextv2 import Block, ConvNeXtV2, init_normal02, init_trunc1
from .norm import LayerNorm

Dtype = Any

PIXEL_HEAD_MODALITIES = (
    "sentinel2", "sentinel1", "aster", "canopy_height_eth",
    "dynamic_world", "esa_worldcover", "IMNET",
)


def gen_random_mask(rng: jax.Array, n: int, num_patches: int, mask_ratio: float) -> jax.Array:
    """(N, L) binary mask, 1 = removed; exactly ``int(L*(1-ratio))`` kept
    (reference fcmae.py:214-231: randn + double argsort)."""
    len_keep = int(num_patches * (1 - mask_ratio))
    noise = jax.random.normal(rng, (n, num_patches))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    mask = jnp.where(
        jnp.arange(num_patches)[None, :] < len_keep, 0.0, 1.0
    )
    mask = jnp.broadcast_to(mask, (n, num_patches))
    return jnp.take_along_axis(mask, ids_restore, axis=1)


def aligned_random_crop(
    rng: jax.Array,
    imgs_dict: Mapping[str, jax.Array],
    img_size: int,
    pixel_wise: Sequence[str] = tuple(M.PIXEL_WISE_MODALITIES),
) -> dict[str, jax.Array]:
    """Random crop with the *same* per-sample offsets for every pixel-wise
    modality (reference fcmae.py:418-434).  NHWC; int modalities are sliced
    exactly (crop is a pure selection; no interpolation).

    Implemented as two one-hot selection matmuls (rows then cols) over the
    channel-concatenated modalities: 0/1xvalue products are exact in f32 for
    every stored value — all float dtypes, and ints with |v| < 2^24, which
    covers every MMEarth modality (labels < 1100, z-normed floats); an int
    raster with values >= 2^24 would lose low bits in the f32 round trip.
    The dots are pinned to ``Precision.HIGHEST``: JAX's default TPU matmul
    precision multiplies f32 operands as bf16, which would quantize the raw
    pixel values (bf16's 8 mantissa bits can't even hold the eco_region label
    ids < 1100) — exactness must not depend on a global matmul-precision
    config.  The MXU eats the work, and the VJPs are the transposed matmuls.
    take_along_axis lowers to serialized per-row gathers (~2.5 ms/step at
    batch 256) and a vmapped dynamic_slice is ~100x slower still (measured
    487 ms vs 4.9 ms)."""
    pixel_keys = [k for k in imgs_dict if k in pixel_wise and imgs_dict[k].ndim == 4]
    if not pixel_keys:
        return dict(imgs_dict)
    src = imgs_dict[pixel_keys[0]]
    n, h, w = src.shape[0], src.shape[1], src.shape[2]
    if h == img_size and w == img_size:
        return dict(imgs_dict)
    ky, kx = jax.random.split(rng)
    tops = jax.random.randint(ky, (n,), 0, h - img_size + 1)
    lefts = jax.random.randint(kx, (n,), 0, w - img_size + 1)
    rows = tops[:, None] + jnp.arange(img_size)[None, :]  # (N, S)
    cols = lefts[:, None] + jnp.arange(img_size)[None, :]
    R = jax.nn.one_hot(rows, h, dtype=jnp.float32)   # (N, S, H)
    Cm = jax.nn.one_hot(cols, w, dtype=jnp.float32)  # (N, S, W)

    # one crop over the channel-concatenated stack, split back afterwards
    parts = [imgs_dict[k].astype(jnp.float32) for k in pixel_keys]
    chans = [p.shape[-1] for p in parts]
    stack = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    c = stack.shape[-1]
    y = jax.lax.dot_general(  # rows: (N,S,H) x (N,H,W*C) -> (N,S,W*C)
        R, stack.reshape(n, h, w * c), dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(n, img_size, w, c)
    y = jax.lax.dot_general(  # cols: (N,S,W) x (N,S',W,C) -> (N,S,S',C)
        Cm, y, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 2, 1, 3)

    out = dict(imgs_dict)
    off = 0
    for k, ch in zip(pixel_keys, chans):
        out[k] = y[..., off:off + ch].astype(imgs_dict[k].dtype)
        off += ch
    return out


class FCMAE(nn.Module):
    """Multi-modal FCMAE.  Inputs/targets are NHWC dicts keyed by modality."""

    img_size: int = 112
    patch_size: int = 16
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    decoder_depth: int = 1
    decoder_embed_dim: int = 512
    mask_ratio: float = 0.6
    norm_pix_loss: bool = False
    sparse: bool = True
    use_orig_stem: bool = False
    padding_mode: str = "same"  # "reference" = dense-path parity padding
    grn_group: int = 0  # MaskedGRN batch scope (0 = global; per-device batch
    #                     reproduces reference per-GPU DDP stats, see norm.py)
    block_impl: str = "auto"  # encoder masked-block impl (see convnextv2.Block)
    sparse_impl: str = "gathered"  # "gathered" | "masked_dense" (see ConvNeXtV2)
    gather_impl: str = "auto"  # "pallas" | "onehot" selection (see ConvNeXtV2)
    stem_gathered: bool = False  # run stem tail on visible rows (see ConvNeXtV2)
    gelu_approx: bool = False  # tanh GELU (opt-in; reference uses exact erf)
    loss_aggr: str = "uncertainty"  # or "unweighted"
    loss_full: bool = False
    inp_modalities: Mapping[str, Any] = None
    out_modalities: Mapping[str, Any] = None
    dtype: Dtype = jnp.float32

    @property
    def in_chans(self) -> int:
        return len(M.resolve_bands(self.inp_modalities)["sentinel2"])

    @property
    def out_chans(self) -> dict[str, int]:
        return M.out_channels(self.out_modalities)

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        self.encoder = ConvNeXtV2(
            patch_size=self.patch_size,
            img_size=self.img_size,
            in_chans=self.in_chans,
            depths=self.depths,
            dims=self.dims,
            sparse=self.sparse,
            use_orig_stem=self.use_orig_stem,
            padding_mode=self.padding_mode,
            grn_group=self.grn_group,
            block_impl=self.block_impl,
            sparse_impl=self.sparse_impl,
            gather_impl=self.gather_impl,
            stem_gathered=self.stem_gathered,
            gelu_approx=self.gelu_approx,
            dtype=self.dtype,
        )
        # FCMAE inits every nn.Conv2d with trunc_normal std 1 (fcmae.py:167-169)
        self.proj = nn.Conv(
            self.decoder_embed_dim, (1, 1), kernel_init=init_trunc1, dtype=self.dtype
        )
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(stddev=0.02), (1, 1, 1, self.decoder_embed_dim), jnp.float32
        )
        self.decoder = [
            Block(
                self.decoder_embed_dim, drop_path=0.0, sparse=False,
                dw_init=init_trunc1, pw_init=init_normal02,
                gelu_approx=self.gelu_approx, dtype=self.dtype,
            )
            for _ in range(self.decoder_depth)
        ]
        # shared LN for image-level heads (fcmae.py:146-148)
        self.layer_norm_tmp = LayerNorm(self.decoder_embed_dim, dtype=self.dtype)

        pixel_heads = {}
        image_heads = {}
        for name in self.out_modalities:
            if name in PIXEL_HEAD_MODALITIES:
                pixel_heads[name] = nn.Conv(
                    self.patch_size ** 2 * self.out_chans[name], (1, 1),
                    kernel_init=init_trunc1, dtype=self.dtype, name=f"pred_{name}",
                )
            else:
                image_heads[name] = nn.Dense(
                    self.out_chans[name], kernel_init=init_normal02,
                    dtype=self.dtype, name=f"pred_{name}",
                )
        self.pixel_heads = pixel_heads
        self.image_heads = image_heads

        if self.loss_aggr == "uncertainty":
            self.log_vars = self.param(
                "log_vars", nn.initializers.zeros, (len(self.out_modalities),), jnp.float32
            )

    # ------------------------------------------------------------------
    def forward_encoder(self, imgs: jax.Array, mask_ratio: float, deterministic=True,
                        mask: Optional[jax.Array] = None):
        """``mask`` (N, L), 1 = removed, overrides random generation — used for
        parity tests against the reference and for visualization.  Generated
        masks have a static visible count, enabling the gathered encoder; an
        explicit mask may not, so it takes the masked-dense path."""
        num_visible = None
        if mask is None:
            rng = self.make_rng("mask")
            mask = gen_random_mask(rng, imgs.shape[0], self.num_patches, mask_ratio)
            num_visible = int(self.num_patches * (1 - mask_ratio))
        x = self.encoder.encode(imgs, mask, deterministic, num_visible=num_visible)
        return x, mask

    def forward_decoder(self, x: jax.Array, mask: jax.Array, deterministic=True):
        """x: (N, g, g, dims[-1]) stage-4 features; mask: (N, L)."""
        x = self.proj(x)
        n, h, w, c = x.shape
        m = mask.reshape(n, h, w, 1).astype(x.dtype)
        token = self.mask_token.astype(x.dtype)
        x = x * (1.0 - m) + token * m
        for blk in self.decoder:
            x = blk(x, None, deterministic)

        preds = {}
        pooled = None
        for name in self.out_modalities:
            if name in PIXEL_HEAD_MODALITIES:
                p = self.pixel_heads[name](x)  # (N, g, g, p^2*C)
                preds[name] = p.reshape(n, h * w, p.shape[-1])
            else:
                if pooled is None:
                    pooled = jnp.mean(self.layer_norm_tmp(x), axis=(1, 2))
                preds[name] = self.image_heads[name](pooled)
        return preds

    def forward_loss(self, targets, preds, mask):
        loss_dict = multipretext_loss(
            preds, targets, mask,
            patch_size=self.patch_size,
            out_chans=self.out_chans,
            norm_pix_loss=self.norm_pix_loss,
            loss_full=self.loss_full,
        )
        if self.loss_aggr == "uncertainty":
            loss, weighted = uncertainty_weighted(loss_dict, self.log_vars)
            return loss, loss_dict, self.log_vars, weighted
        loss, weighted = unweighted(loss_dict)
        return loss, loss_dict, None, weighted

    def __call__(
        self,
        imgs_dict: Mapping[str, jax.Array],
        mask_ratio: Optional[float] = None,
        deterministic: bool = True,
        mask: Optional[jax.Array] = None,
    ):
        """imgs_dict: cropped NHWC modality dict (crop + NaN-zeroing of the
        continuous pixel modalities happen in the input path, matching
        fcmae.py:418-449).  Returns (loss, preds, mask, loss_dict, log_vars,
        weighted_losses)."""
        mask_ratio = self.mask_ratio if mask_ratio is None else mask_ratio
        imgs = imgs_dict["sentinel2"].astype(self.dtype)
        x, mask = self.forward_encoder(imgs, mask_ratio, deterministic, mask=mask)
        preds = self.forward_decoder(x, mask, deterministic)
        loss, loss_dict, log_vars, weighted = self.forward_loss(imgs_dict, preds, mask)
        return loss, preds, mask, loss_dict, log_vars, weighted


def zero_nan_inputs(imgs_dict: Mapping[str, jax.Array]) -> dict[str, jax.Array]:
    """NaN/inf -> 0 for the continuous pixel modalities (fcmae.py:445-449);
    these arrays double as targets, so their losses see zeroed values too."""
    out = {}
    for name, arr in imgs_dict.items():
        if name in M.CONTINUOUS_PIXEL_MODALITIES:
            out[name] = jnp.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
        else:
            out[name] = arr
    return out


def _factory(depths, dims):
    def build(**kwargs):
        kwargs.setdefault("depths", depths)
        kwargs.setdefault("dims", dims)
        return FCMAE(**kwargs)

    return build


convnextv2_atto = _factory((2, 2, 6, 2), (40, 80, 160, 320))
convnextv2_femto = _factory((2, 2, 6, 2), (48, 96, 192, 384))
convnextv2_pico = _factory((2, 2, 6, 2), (64, 128, 256, 512))
convnextv2_nano = _factory((2, 2, 8, 2), (80, 160, 320, 640))
convnextv2_tiny = _factory((3, 3, 9, 3), (96, 192, 384, 768))
convnextv2_base = _factory((3, 3, 27, 3), (128, 256, 512, 1024))
convnextv2_large = _factory((3, 3, 27, 3), (192, 384, 768, 1536))
convnextv2_huge = _factory((3, 3, 27, 3), (352, 704, 1408, 2816))
