# gpmp_tpu/parallel/batched.py
"""Data-parallel batched criterion evaluation over a device mesh.

TPU-native replacement for the reference's serial batched criterion
(numpy_backend.py:353-428 / torch_backend.py:607-718): batches are laid
out as a (num_batches, batch_size, d) array sharded over the mesh's
batch axis; each device evaluates its local batches (vmap), and a psum
over ICI produces the global batch-size-weighted mean.  One jitted
value_and_grad program; gradients psum automatically through the
collective.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

import gpmp_tpu.num as gnp


def shard_batches(x, z, n_batches, mesh=None, axis_name="batch"):
    """Stack (x, z) into (n_batches, b, d) / (n_batches, b) batch arrays,
    truncating the remainder, and (optionally) place them sharded over the
    mesh's batch axis.

    n_batches must be a multiple of the mesh axis size when a mesh is given.
    """
    x = np.asarray(gnp.to_np(gnp.asarray(x)))
    z = np.asarray(gnp.to_np(gnp.asarray(z))).reshape(-1)
    n, d = x.shape
    b = n // n_batches
    if b == 0:
        raise ValueError("n_batches larger than number of points")
    xb = x[: n_batches * b].reshape(n_batches, b, d)
    zb = z[: n_batches * b].reshape(n_batches, b)
    xb_j = jnp.asarray(xb)
    zb_j = jnp.asarray(zb)
    if mesh is not None:
        if n_batches % mesh.shape[axis_name] != 0:
            raise ValueError(
                "n_batches must be divisible by the mesh batch-axis size"
            )
        sh = NamedSharding(mesh, P(axis_name))
        xb_j = jax.device_put(xb_j, sh)
        zb_j = jax.device_put(zb_j, sh)
    return xb_j, zb_j


def make_data_parallel_criterion(criterion_fn, mesh, axis_name="batch"):
    """Build jitted (value, grad) of the mean per-point criterion over
    sharded batches.

    criterion_fn: f(p, x_batch, z_batch) -> scalar (e.g. REML NLL of one
    batch).  The total is sum_b f(p, xb, zb) * b_size / n  -- identical
    semantics to the reference's BatchDifferentiableSelectionCriterion
    with reduction='mean'.

    Returns value_and_grad_fn(p, xb, zb) -> (value, grad), where xb has
    shape (num_batches, b, d) sharded over the mesh batch axis.
    """

    def total_mean(p, xb, zb):
        def per_shard(p, xs, zs):
            # xs: (local_batches, b, d)
            vals = jax.vmap(lambda x, z: criterion_fn(p, x, z))(xs, zs)
            local = jnp.sum(vals * xs.shape[1])
            return jax.lax.psum(local, axis_name)

        f = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)),
            out_specs=P(),
        )
        total = f(p, xb, zb)
        n_samples = xb.shape[0] * xb.shape[1]
        return total / n_samples

    return jax.jit(jax.value_and_grad(total_mean))
