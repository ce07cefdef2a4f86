# gpmp_tpu/parallel/gram.py
"""Row-sharded gram-matrix construction and matvecs over a device mesh.

For n beyond single-chip HBM, the (n, n) covariance matrix lives
row-sharded across devices: device k holds the (n / n_dev, n) row block
K[k].  Construction needs only an all-gather of the (much smaller)
(n, d) point array; each device then computes its block locally -- no
K-sized communication ever happens.  (This is the 'ring-attention slot'
of SURVEY.md section 5: K never materializes on one chip.)
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_gram(cov_fn, x, covparam, mesh, axis_name="shard"):
    """Compute K = cov_fn(x, x, covparam) with rows sharded over the mesh.

    cov_fn must accept (x_rows, y_cols, covparam) and return the cross
    covariance WITHOUT assuming x_rows is y_cols (the nugget is added to
    the global diagonal here).

    x: (n, d) with n divisible by the mesh axis size.  Returns a global
    (n, n) array sharded P(axis_name, None).
    """
    n = x.shape[0]
    n_dev = mesh.shape[axis_name]
    if n % n_dev != 0:
        raise ValueError("n must be divisible by the mesh axis size")

    def per_shard(x_local, x_full, covparam):
        # x_local: (n/n_dev, d); x_full: (n, d) replicated
        return cov_fn(x_local, x_full, covparam)

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=P(axis_name),
    )
    x_sharded = jax.device_put(x, NamedSharding(mesh, P(axis_name)))
    x_repl = jax.device_put(x, NamedSharding(mesh, P()))
    return f(x_sharded, x_repl, covparam)


def sharded_matvec(K_sharded, v, mesh, axis_name="shard"):
    """y = K v with K row-sharded: purely local dot per device, output
    sharded like K's rows."""

    def per_shard(Kl, v_full):
        return Kl @ v_full

    f = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
    )
    return f(K_sharded, v)
