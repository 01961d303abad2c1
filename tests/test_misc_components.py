"""Smaller components: ResNet baselines, EMA, array scheduler, diagnostics,
visualization plumbing."""
import jax
import jax.numpy as jnp
import numpy as np

from mmearth_tpu.models.resnet import resnet18, resnet50
from mmearth_tpu.train.ema import init_ema, update_ema
from mmearth_tpu.train.schedule import cosine_scheduler_array, warmup_cosine


def test_resnet_shapes():
    for builder, nparams_min in ((resnet18, 11e6), (resnet50, 23e6)):
        model = builder(num_classes=10, in_chans=12)
        x = jnp.zeros((2, 64, 64, 12))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits = model.apply(variables, x)
        assert logits.shape == (2, 10)
        n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
        assert n > nparams_min, n
        # train-mode mutates batch stats
        _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in mutated


def test_ema_moves_toward_params():
    params = {"w": jnp.zeros((4,))}
    target = {"w": jnp.ones((4,))}
    ema = init_ema(params)
    for _ in range(10):
        ema = update_ema(ema, target, decay=0.5)
    assert float(jnp.abs(ema["w"] - 1.0).max()) < 1e-2


def test_cosine_scheduler_array_matches_stepwise():
    arr = cosine_scheduler_array(1e-3, 1e-5, epochs=10, niter_per_ep=20, warmup_epochs=2)
    assert len(arr) == 200
    assert arr[0] == 0.0
    assert abs(arr[39] - 1e-3) < 1e-4  # end of warmup
    assert arr[-1] >= 1e-5
    # per-step functional schedule agrees with the closed form after warmup
    fn = warmup_cosine(1e-3, 1e-5, 10, 2, 20)
    for step in (60, 120, 199):
        assert abs(float(fn(step)) - arr[step]) < 5e-5


def test_diagnostics_runs(capsys):
    from mmearth_tpu.utils.diagnostics import print_diagnostics

    print_diagnostics()
    out = capsys.readouterr().out
    assert "jax:" in out and "devices:" in out


def test_visualize_panels(tmp_path):
    """eval/visualize renders the 4-panel figure per pixel modality
    (reference visualize_masking.py:58-330) from a random-init model."""
    import jax
    import jax.numpy as jnp

    from mmearth_tpu.configs import modalities as M
    from mmearth_tpu.eval import visualize as V
    from mmearth_tpu.models import fcmae as fcmae_lib
    from __graft_entry__ import _synthetic_batch

    model = fcmae_lib.FCMAE(
        img_size=32, patch_size=8, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
        decoder_depth=1, decoder_embed_dim=32, sparse=True,
        inp_modalities=M.INP_MODALITIES, out_modalities=M.OUT_MODALITIES,
        dtype=jnp.float32,
    )
    batch = {k: jnp.asarray(v[:, :32, :32] if v.ndim == 4 else v)
             for k, v in _synthetic_batch(2, 32).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        fcmae_lib.zero_nan_inputs(batch))
    maps, mask = V.run_one_batch(model, variables["params"], batch)
    out = V.render_panels(model, batch, maps, mask, tmp_path / "viz")
    pngs = sorted(p.name for p in out.glob("*.png"))
    assert "sentinel2.png" in pngs and "dynamic_world.png" in pngs
    assert len(pngs) >= 4
