# gpmp_tpu/parallel/mesh.py
"""Device-mesh helpers for gpmp_tpu."""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, axis_name="batch"):
    """1-D mesh over the first n_devices devices (default: all)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"Requested {n_devices} devices but only {len(devices)} available."
        )
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def default_mesh(axis_name="batch"):
    """Mesh over all available devices."""
    return make_mesh(None, axis_name)
