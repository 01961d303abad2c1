"""stratified_subsample_multilabel behavior (reference tests/stratified_test.py)."""
import numpy as np

from mmearth_tpu.data.subsample import stratified_subsample_multilabel


def test_proportions_single_label():
    y = np.array([0] * 50 + [1] * 30 + [2] * 20)
    idx = stratified_subsample_multilabel(y, percentage=0.5)
    assert len(idx) == 50
    assert len(set(idx.tolist())) == 50  # no duplicates
    counts = np.bincount(y[idx], minlength=3)
    # near-equal per-class budget (50 // 3 = 16 each + 2 round-robin)
    assert counts.min() >= 16


def test_small_class_fully_used():
    y = np.array([0] * 97 + [1] * 3)
    idx = stratified_subsample_multilabel(y, num_samples=20)
    assert len(idx) == 20
    assert np.bincount(y[idx], minlength=2)[1] == 3  # all of the rare class


def test_num_samples_exact():
    y = np.arange(100) % 7
    idx = stratified_subsample_multilabel(y, num_samples=33)
    assert len(idx) == 33


def test_multilabel_coverage():
    rng = np.random.default_rng(0)
    y = [list(np.where(rng.random(5) < 0.4)[0]) or [0] for _ in range(200)]
    idx = stratified_subsample_multilabel(y, num_samples=60, multilabel=True, classes=list(range(5)))
    assert len(idx) == 60
    assert len(set(idx.tolist())) == 60
    covered = set()
    for i in idx:
        covered.update(y[int(i)])
    assert covered == set(range(5))


def test_full_percentage_returns_y():
    y = np.array([0, 1, 0, 1])
    out = stratified_subsample_multilabel(y, percentage=1)
    assert out is y
