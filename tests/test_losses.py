"""Loss-family parity against torch golden implementations that mirror the
reference's forward_loss math (fcmae.py:267-412, custom_loss.py:10-30)."""
import jax.numpy as jnp
import numpy as np
import torch

from mmearth_tpu.losses import multipretext as mp


def test_patchify_roundtrip_matches_torch_order():
    rng = np.random.default_rng(0)
    n, hw, c, p = 2, 16, 3, 4
    x = rng.normal(size=(n, hw, hw, c)).astype(np.float32)
    ours = np.asarray(mp.patchify(jnp.array(x), p))

    # reference patchify on NCHW (fcmae.py:180-197)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    h = w = hw // p
    tx = t.reshape(n, c, h, p, w, p)
    tx = torch.einsum("nchpwq->nhwpqc", tx).reshape(n, h * w, p * p * c)
    np.testing.assert_allclose(ours, tx.numpy(), atol=0)

    back = np.asarray(mp.unpatchify(jnp.array(ours), p, hw, c))
    np.testing.assert_allclose(back, x, atol=0)


def test_image_categorical_matches_torch():
    rng = np.random.default_rng(1)
    onehot = np.eye(14, dtype=np.int64)[rng.integers(0, 14, size=5)]
    pred = rng.normal(size=(5, 14)).astype(np.float32)
    ours = float(mp.image_categorical_loss(jnp.array(pred), jnp.array(onehot)))
    golden = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(pred), torch.from_numpy(onehot).argmax(-1)
    ).item()
    assert abs(ours - golden) < 5e-5


def test_image_continuous_matches_torch():
    rng = np.random.default_rng(2)
    target = rng.normal(size=(5, 12)).astype(np.float32)
    target[rng.random(target.shape) < 0.3] = np.nan
    pred = rng.normal(size=(5, 12)).astype(np.float32)
    ours = float(mp.image_continuous_loss(jnp.array(pred), jnp.array(target)))
    t, p = torch.from_numpy(target), torch.from_numpy(pred)
    nan = torch.isnan(t)
    golden = torch.nn.MSELoss()(p[~nan], t[~nan]).item()
    assert abs(ours - golden) < 5e-5


def test_pixel_categorical_matches_torch():
    rng = np.random.default_rng(3)
    n, g, p, C = 2, 4, 4, 9
    L = g * g
    img = rng.integers(-1, C, size=(n, g * p, g * p, 1)).astype(np.int64)
    pred = rng.normal(size=(n, L, p * p * C)).astype(np.float32)
    mask = (rng.random((n, L)) < 0.6).astype(np.float32)

    ours = float(
        mp.pixel_categorical_loss(jnp.array(pred), jnp.array(img), jnp.array(mask), p, C)
    )

    # golden: reference fcmae.py:302-346
    tpred = torch.from_numpy(pred).reshape(n, L, p * p, C)
    t = torch.from_numpy(img.transpose(0, 3, 1, 2)).float()
    tt = t.reshape(n, 1, g, p, g, p)
    tt = torch.einsum("nchpwq->nhwpqc", tt).reshape(n, L, p * p)
    tmask = torch.from_numpy(mask)[:, :, None].repeat(1, 1, p * p).reshape(n, -1)
    target = tt.reshape(n, -1)
    tpred = tpred.reshape(n, -1, C)
    sel_t = target[tmask == 1].long()
    sel_p = tpred[tmask == 1]
    keepv = sel_t != -1
    golden = torch.nn.CrossEntropyLoss()(sel_p[keepv], sel_t[keepv]).item()
    assert abs(ours - golden) < 5e-5


def test_pixel_continuous_matches_torch():
    rng = np.random.default_rng(4)
    n, g, p, C = 2, 4, 4, 12
    L = g * g
    img = rng.normal(size=(n, g * p, g * p, C)).astype(np.float32)
    pred = rng.normal(size=(n, L, p * p * C)).astype(np.float32)
    mask = (rng.random((n, L)) < 0.6).astype(np.float32)

    ours = float(mp.pixel_continuous_loss(jnp.array(pred), jnp.array(img), jnp.array(mask), p))

    # golden: reference fcmae.py:366-403 (inputs already NaN-zeroed upstream)
    t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    tt = t.reshape(n, C, g, p, g, p)
    tt = torch.einsum("nchpwq->nhwpqc", tt).reshape(n, L, p * p * C)
    loss = (torch.from_numpy(pred) - tt) ** 2
    nanm = torch.isnan(loss)
    count = torch.count_nonzero(~nanm, dim=-1)
    loss[nanm] = 0
    loss = loss.sum(dim=-1) / count
    tmask = torch.from_numpy(mask)
    tmp = loss * tmask
    tmp[torch.isnan(tmp)] = 0
    golden = (tmp.sum() / torch.count_nonzero(tmp)).item()
    assert abs(ours - golden) < 5e-5


def test_uncertainty_aggregation_matches_torch():
    rng = np.random.default_rng(5)
    losses = {f"m{i}": jnp.array(v) for i, v in enumerate(rng.random(6).astype(np.float32))}
    losses["m2"] = jnp.array(0.0)  # dropped task
    log_vars = rng.normal(size=(6,)).astype(np.float32)
    total, weighted = mp.uncertainty_weighted(losses, jnp.array(log_vars))

    lt = torch.tensor([float(v) for v in losses.values()])
    lv = torch.from_numpy(log_vars)
    wt = torch.exp(-lv) * lt + lv
    wt = wt * (lt != 0.0)
    assert abs(float(total) - wt.sum().item()) < 1e-5
    np.testing.assert_allclose(np.asarray(weighted), wt.numpy(), rtol=1e-4, atol=1e-5)


def test_dice_loss_matches_confusion_matrix_oracle():
    """dice_loss vs an independent numpy confusion-matrix implementation of
    torchmetrics Dice(average='macro') on hard predictions (the reference's
    DiceLoss, custom_loss.py:54-63; torchmetrics is not in this image, so the
    oracle reimplements its macro reduction: per-class 2TP/(2TP+FP+FN),
    averaged over classes with nonzero denominator)."""
    from mmearth_tpu.losses.finetune import dice_loss

    rng = np.random.default_rng(11)
    for num_classes, shape in [(5, (4, 8, 8)), (3, (16,)), (7, (2, 6, 6))]:
        logits = rng.normal(size=shape + (num_classes,)).astype(np.float32)
        target = rng.integers(0, num_classes, size=shape)
        ours = float(dice_loss(jnp.array(logits), jnp.array(target), num_classes))

        pred = logits.reshape(-1, num_classes).argmax(-1)
        t = target.reshape(-1)
        scores, n_support = 0.0, 0
        for c in range(num_classes):
            tp = int(np.sum((pred == c) & (t == c)))
            fp = int(np.sum((pred == c) & (t != c)))
            fn = int(np.sum((pred != c) & (t == c)))
            if 2 * tp + fp + fn > 0:
                scores += 2 * tp / (2 * tp + fp + fn)
                n_support += 1
        golden = 1.0 - scores / max(n_support, 1)
        assert abs(ours - golden) < 1e-6


def test_dice_loss_edge_cases():
    from mmearth_tpu.losses.finetune import dice_loss

    # perfect prediction -> loss 0
    target = np.array([0, 1, 2, 1])
    logits = np.eye(3)[target] * 10.0
    assert abs(float(dice_loss(jnp.array(logits), jnp.array(target), 3))) < 1e-6
    # absent class (id 2 never appears in pred or target) excluded from macro
    target = np.array([0, 0, 1, 1])
    logits = np.eye(3)[[0, 0, 1, 1]] * 10.0
    assert abs(float(dice_loss(jnp.array(logits), jnp.array(target), 3))) < 1e-6


def test_loss_full_covers_all_patches():
    """--loss_full True computes the reconstruction losses over every patch
    (mask forced to all-ones), i.e. it equals the masked loss with mask=1."""
    import jax.numpy as jnp

    from mmearth_tpu.losses.multipretext import multipretext_loss

    rng = np.random.default_rng(0)
    n, img, p, c = 2, 16, 8, 3
    L = (img // p) ** 2
    preds = {"sentinel2": jnp.asarray(rng.normal(size=(n, L, p * p * c)).astype(np.float32))}
    targets = {"sentinel2": jnp.asarray(rng.normal(size=(n, img, img, c)).astype(np.float32))}
    mask = jnp.asarray((rng.random((n, L)) < 0.6).astype(np.float32))

    kw = dict(patch_size=p, out_chans={"sentinel2": c})
    full = multipretext_loss(preds, targets, mask, loss_full=True, **kw)
    ones = multipretext_loss(preds, targets, jnp.ones_like(mask), **kw)
    masked = multipretext_loss(preds, targets, mask, **kw)
    assert float(full["sentinel2"]) == float(ones["sentinel2"])
    assert float(full["sentinel2"]) != float(masked["sentinel2"])
