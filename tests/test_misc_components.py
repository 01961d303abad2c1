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
