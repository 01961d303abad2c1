"""Environment diagnostics (reference diagnostics.py:19-66, TPU edition)."""
from __future__ import annotations

import platform
import sys


def print_diagnostics():
    print(f"python: {sys.version.split()[0]}  platform: {platform.platform()}")
    try:
        import jax

        print(f"jax: {jax.__version__}")
        print(f"backend: {jax.default_backend()}")
        for d in jax.devices():
            print(f"  device: {d.device_kind} (id {d.id}, process {d.process_index})")
        print(f"devices: {jax.device_count()} global / {jax.local_device_count()} local, "
              f"processes: {jax.process_count()}")
    except Exception as e:  # pragma: no cover
        print(f"jax unavailable: {e}")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy", "h5py"):
        try:
            m = __import__(mod)
            print(f"{mod}: {getattr(m, '__version__', 'unknown')}")
        except ImportError:
            print(f"{mod}: not installed")


if __name__ == "__main__":
    print_diagnostics()
