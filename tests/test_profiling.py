"""utils/profiling.py: trace capture + summarization + the chained step timer
(all on the CPU backend; on-chip use is exercised by scripts/roofline.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from mmearth_tpu.utils import profiling


def test_trace_and_summarize(tmp_path):
    f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum())
    x = jnp.ones((256, 256))
    f(x).block_until_ready()  # compile outside the trace
    with profiling.trace(str(tmp_path)):
        f(x).block_until_ready()
    rows = profiling.summarize_trace(str(tmp_path), top=5, device="CPU")
    assert rows and all(len(r) == 3 for r in rows)
    assert all(r[1] >= 0 for r in rows)


def test_time_steps_runs():
    def step(state, batch, rng):
        return state + batch.sum() * 0, {"loss": batch.mean()}

    dt, _ = profiling.time_steps(step, jnp.float32(0), jnp.ones((8, 8)),
                                 jax.random.PRNGKey(0), k=3, rounds=2)
    assert np.isfinite(dt) and dt > 0
