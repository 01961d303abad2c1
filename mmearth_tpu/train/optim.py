"""Optimizer construction with optax.

Replaces the reference's param-group machinery:
  * pretrain: AdamW betas (0.9, 0.95), weight decay on >1-dim params only —
    timm's param_groups_weight_decay (main_pretrain.py:312-320).  Note the
    torch GRN affines and the mask token are 4-dim there and therefore DO get
    weight decay; ours are stored flat, so the mask marks them explicitly.
  * finetune: layer-wise LR decay (optim_factory.py:31-96,
    main_finetune.py:530-544): per-block ids from depths ("single") or the
    12-group ConvNeXt scheme ("group"); no-decay set additionally excludes
    GRN gamma/beta (optim_factory.py:108-119).
  * gradient accumulation: optax.MultiSteps (engine ``update_freq``).
  * parameter freezing (linear probe / staged unfreeze): optax.multi_transform
    with a zero transform — the optax analogue of requires_grad=False.
"""
from __future__ import annotations

from typing import Callable, Mapping, Sequence

import jax
import numpy as np
import optax


def path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def tree_path_map(fn: Callable[[str, jax.Array], object], tree):
    return jax.tree_util.tree_map_with_path(lambda p, x: fn(path_str(p), x), tree)


# ---------------------------------------------------------------------------
# weight-decay masks
# ---------------------------------------------------------------------------
def pretrain_wd_mask(params):
    """Decay iff torch-side ndim > 1 (timm param_groups_weight_decay).  GRN
    gamma/beta and the mask token are (1,1,1,C)/(1,C) in torch -> decayed."""

    def decide(path, leaf):
        if "grn/" in path or path.endswith("mask_token"):
            return True
        return leaf.ndim > 1

    return tree_path_map(decide, params)


def finetune_wd_mask(params):
    """No decay for 1-dim, bias, GRN gamma/beta (optim_factory.py:108-119)."""

    def decide(path, leaf):
        if leaf.ndim <= 1 or path.endswith("bias"):
            return False
        if path.endswith("gamma") or path.endswith("beta"):
            return False
        return True

    return tree_path_map(decide, params)


# ---------------------------------------------------------------------------
# layer-wise LR decay (reference optim_factory.py:31-96)
# ---------------------------------------------------------------------------
def _parse_stage_block(path: str) -> tuple[str, int, int]:
    """Map a flax param path to the reference naming scheme.  Our modules are
    named stages_{i}_{j} / downsample_convs_{i} / downsample_norms_{i} /
    stem_* / initial_conv_* / norm / head."""
    parts = path.split("/")
    head = parts[0]
    if head.startswith("encoder"):
        head = parts[1] if len(parts) > 1 else head
    if head.startswith("stages_"):
        _, i, j = head.split("_")
        return "stages", int(i), int(j)
    if head.startswith("downsample_"):
        i = int(head.split("_")[-1])
        return "downsample_layers", i, 0
    # NOTE the reference's modified stem modules are named ``initial_conv`` /
    # ``stem`` / ``stem_orig`` (models/convnextv2.py:98-124), which match
    # NEITHER prefix in get_num_layer_for_convnext_single/-_convnext
    # (optim_factory.py:31-78) — they fall into the else branch and get the
    # TOP layer id, i.e. the stem trains at full LR under layer decay, same
    # as the head.  Surprising but it is the reference behavior; verified
    # end-to-end by tests/test_trajectory_parity.py against the reference's
    # own optim_factory.
    return "other", -1, -1


def layer_id_single(path: str, depths: Sequence[int]) -> int:
    """optim_factory.get_num_layer_for_convnext_single (:31-47)."""
    kind, i, j = _parse_stage_block(path)
    if kind == "downsample_layers":
        return sum(depths[:i]) + 1
    if kind == "stages":
        return sum(depths[:i]) + j + 1
    return sum(depths) + 1


def layer_id_group(path: str) -> int:
    """optim_factory.get_num_layer_for_convnext (:50-78), 12-group scheme."""
    kind, i, j = _parse_stage_block(path)
    if kind == "downsample_layers":
        return {0: 0, 1: 2, 2: 3, 3: 12}[i]
    if kind == "stages":
        if i in (0, 1):
            return i + 1
        if i == 2:
            return 3 + j // 3
        return 12
    return 13


def layer_lr_scales(params, layer_decay: float, depths: Sequence[int], kind: str = "single"):
    """Per-leaf lr multipliers: decay ** (num_layers + 1 - layer_id)
    (main_finetune.py:530-544)."""
    num_layers = 12 if kind == "group" else sum(depths)

    def scale(path, leaf):
        lid = layer_id_group(path) if kind == "group" else layer_id_single(path, depths)
        return layer_decay ** (num_layers + 1 - lid)

    return tree_path_map(scale, params)


def scale_by_pytree(scales) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by static factors (the lr_scale of torch
    param groups; applied after scale_by_learning_rate, so both the adam step
    and the decoupled weight decay are scaled, matching torch AdamW)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def zero_grads_mask(params, trainable: Callable[[str], bool]):
    """Boolean pytree: True = trainable (requires_grad equivalent)."""
    return tree_path_map(lambda p, x: bool(trainable(p)), params)


def mask_updates(trainable_mask) -> optax.GradientTransformation:
    """Zero the incoming gradients of frozen leaves (requires_grad=False
    equivalent).  With zeroed grads, scale_by_adam keeps mu=nu=0 so the final
    update is exactly 0 — provided weight decay is also masked off for frozen
    leaves (the builders below combine the masks)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return (
            jax.tree_util.tree_map(
                lambda u, t: u if t else jax.numpy.zeros_like(u), updates, trainable_mask
            ),
            state,
        )

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# optimizer families (reference optim_factory.py:149-252)
# ---------------------------------------------------------------------------
def _opt_scaler(opt: str, betas, eps: float, momentum: float):
    """Map a reference ``--opt`` name to (optax scaler, decoupled_wd).

    Torch semantics: only AdamW decouples weight decay; the other families
    apply coupled L2 (wd*param added to the gradient before the momentum /
    adaptive statistics), so the caller must place add_decayed_weights before
    a coupled scaler and after a decoupled one.  Exceptions: lamb folds wd in
    before the trust-ratio normalization, and novograd applies wd after its
    per-layer gradient normalization — both signalled by a marker.  ``fused*`` prefixes (apex)
    map to the plain family — under XLA everything is fused anyway.  Exact
    torch-trajectory parity is tested for sgd/momentum/nesterov/adam/adamw
    (tests/test_opt_families.py); nadam/radam/adadelta/rmsprop/novograd/lamb
    use the optax definitions, which differ from timm's in minor details
    (PARITY.md).  adamp/sgdp/adahessian have no optax equivalent -> error,
    as the reference errors without its optional deps.
    """
    o = opt.lower()
    if o.startswith("fused"):
        o = o[len("fused"):]
    b1, b2 = betas
    if o == "adamw":
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps), True
    if o == "adam":
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps), False
    if o == "nadam":
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps, nesterov=True), False
    if o == "radam":
        return optax.scale_by_radam(b1=b1, b2=b2, eps=eps), False
    if o in ("sgd", "nesterov"):
        return optax.trace(decay=momentum, nesterov=True), False
    if o == "momentum":
        return optax.trace(decay=momentum, nesterov=False), False
    if o == "adadelta":
        return optax.scale_by_adadelta(eps=eps), False
    if o == "adafactor":
        return optax.scale_by_factored_rms(), False
    if o in ("rmsprop", "rmsproptf"):
        # torch.optim.RMSprop(alpha=0.9, momentum=momentum) (optim_factory
        # :216-221): eps outside the sqrt; the tf variant differs only in
        # eps placement/init.
        return optax.chain(
            optax.scale_by_rms(decay=0.9, eps=eps, eps_in_sqrt=False),
            optax.trace(decay=momentum, nesterov=False),
        ), False
    if o in ("novograd", "nvnovograd"):
        # wd is applied AFTER the per-layer gradient normalization (timm
        # NvNovoGrad / optax semantics) — handled by the caller, which
        # partitions by the wd mask because scale_by_novograd's own
        # weight_decay is unmasked
        return (b1, b2), "novograd"
    if o == "lamb":
        # wd folds in before the trust-ratio normalization (as in optax.lamb)
        return optax.scale_by_adam(b1=b1, b2=b2, eps=eps), "lamb"
    raise ValueError(f"Optimizer {opt!r} not supported (reference optim_factory.py:252)")


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------
def make_pretrain_optimizer(
    params,
    lr_schedule,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.95),
    update_freq: int = 1,
    clip_grad: float | None = None,
) -> optax.GradientTransformation:
    chain = []
    if clip_grad is not None:
        # reference unscale-then-clip order (helpers.py:476-500): clip the raw
        # gradients by global norm before any adam scaling
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain += [
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.add_decayed_weights(weight_decay, mask=pretrain_wd_mask(params)),
        optax.scale_by_learning_rate(lr_schedule),
    ]
    tx = optax.chain(*chain)
    if update_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_freq)
    return tx


def make_finetune_optimizer(
    params,
    lr_schedule,
    weight_decay: float = 0.3,
    betas: tuple[float, float] = (0.9, 0.999),
    layer_decay: float = 1.0,
    layer_decay_type: str = "single",
    depths: Sequence[int] = (2, 2, 6, 2),
    trainable_mask=None,
    update_freq: int = 1,
    clip_grad: float | None = None,
    opt: str = "adamw",
    opt_eps: float = 1e-8,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    wd_mask = finetune_wd_mask(params)
    if trainable_mask is not None:
        wd_mask = jax.tree_util.tree_map(lambda w, t: bool(w and t), wd_mask, trainable_mask)
    chain = []
    if trainable_mask is not None:
        chain.append(mask_updates(trainable_mask))
    if clip_grad is not None:
        # after mask_updates so frozen leaves contribute 0 to the global norm
        # (torch computes the norm over requires_grad params only,
        # helpers.py:476-500 + main_finetune.py:629)
        chain.append(optax.clip_by_global_norm(clip_grad))
    scaler, decoupled = _opt_scaler(opt, betas, opt_eps, momentum)
    if decoupled == "lamb":
        chain += [scaler,
                  optax.add_decayed_weights(weight_decay, mask=wd_mask),
                  optax.scale_by_trust_ratio()]
    elif decoupled == "novograd":
        b1, b2 = scaler
        labels = jax.tree_util.tree_map(lambda m: "wd" if m else "nowd", wd_mask)
        chain.append(optax.multi_transform(
            {"wd": optax.scale_by_novograd(b1=b1, b2=b2, eps=opt_eps,
                                           weight_decay=weight_decay),
             "nowd": optax.scale_by_novograd(b1=b1, b2=b2, eps=opt_eps)},
            labels,
        ))
    elif decoupled:
        chain += [scaler, optax.add_decayed_weights(weight_decay, mask=wd_mask)]
    else:
        # coupled L2: decay enters the gradient before the momentum/adaptive
        # statistics (torch non-AdamW semantics)
        chain += [optax.add_decayed_weights(weight_decay, mask=wd_mask), scaler]
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    if layer_decay != 1.0:
        chain.append(scale_by_pytree(layer_lr_scales(params, layer_decay, depths, layer_decay_type)))
    tx = optax.chain(*chain)
    if update_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_freq)
    return tx
