"""utils/logging.py: meters, print cadence, tensorboard epoch_1000x, wandb gate
(reference helpers.py:48-289)."""
import numpy as np

from mmearth_tpu.utils.logging import MetricLogger, Meter, TensorboardWriter, maybe_wandb


def test_meter_weighted_average():
    m = Meter()
    m.update(1.0, n=3)
    m.update(5.0, n=1)
    assert m.value == 5.0
    assert np.isclose(m.avg, (1.0 * 3 + 5.0) / 4)


def test_metric_logger_cadence_and_averages(capsys):
    ml = MetricLogger(print_freq=2, header="Epoch: [0]")
    for i, _ in ml.log_every(range(5)):
        ml.update(loss=float(i))
    out = capsys.readouterr().out
    # prints at i = 0, 2, 4 (freq 2) and the final iteration
    assert out.count("Epoch: [0]") == 3
    assert "[4/5]" in out  # last-iteration line
    assert np.isclose(ml.averages()["loss"], np.mean([0, 1, 2, 3, 4]))


def test_tensorboard_epoch_1000x(tmp_path):
    tb = TensorboardWriter(str(tmp_path))
    tb.log({"loss": 1.5}, epoch_frac=2.25)  # -> global step 2250
    tb.flush()
    tb.writer.close()  # flush() leaves the record buffered; close() lands it
    events = list(tmp_path.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
    assert b"train/loss" in events[0].read_bytes()


def test_maybe_wandb_disabled_and_missing():
    assert maybe_wandb(False, "p", None, {}) is None
    # enabled but (likely) not installed in this image: must not raise
    try:
        import wandb  # noqa: F401
    except ImportError:
        assert maybe_wandb(True, "p", None, {}) is None
