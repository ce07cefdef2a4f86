# examples/gpmp_tpu_example40_sharded_large_n.py
"""Exact large-n GP fit + predict with the covariance sharded over a
device mesh.

TPU-native example with no reference counterpart (the reference's only
large-n mechanism is mini-batched criteria): the (n, n) covariance is
row-sharded across the mesh, factored by the distributed blocked
Cholesky, and both the REML criterion (value+grad, fed to the SciPy
optimizer) and the kriging prediction run without the matrix ever
existing on one chip.

Run with a virtual mesh on CPU:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python <this file>
On a TPU pod slice, the same code scales n to the aggregate HBM.
"""

import numpy as np

import jax
import jax.numpy as jnp

import gpmp_tpu as gp
import gpmp_tpu.num as gnp
from gpmp_tpu.parallel import (
    make_mesh,
    sharded_negative_log_restricted_likelihood,
    sharded_predict,
)

N, NT, D = 1024, 256, 3
BLOCK = 128
NOISE_STD = 0.1
SEED = 0


def constant_mean(x, param):
    return gnp.ones((x.shape[0], 1))


def kernel(x, y, param, pairwise=False):
    """Matern 5/2 + observation noise; covparam =
    [log sigma2, log noise_variance, log 1/rho_1..d]."""
    sigma2 = gnp.exp(param[0])
    loginvrho = param[2:]
    if y is x or y is None:
        noise = gnp.exp(param[1])
        if pairwise:
            return (sigma2 + noise) * gnp.ones((x.shape[0],))
        K = gnp.scaled_distance(loginvrho, x, x)
        return sigma2 * gp.kernel.maternp_kernel(2, K) + noise * gnp.eye(
            K.shape[0]
        )
    K = (gnp.scaled_distance_elementwise if pairwise
         else gnp.scaled_distance)(loginvrho, x, y)
    return sigma2 * gp.kernel.maternp_kernel(2, K)


def generate_data(seed=SEED, n=N, nt=NT):
    rng = np.random.default_rng(seed)
    xi = rng.uniform(size=(n, D))
    xt = rng.uniform(size=(nt, D))
    f = lambda x: np.sin(4 * x[:, 0]) + 0.7 * np.cos(6 * x[:, 1]) + 0.3 * x[:, 2]
    zi = f(xi) + NOISE_STD * rng.normal(size=n)
    return gnp.asarray(xi), gnp.asarray(zi), gnp.asarray(xt), f(xt)


def main(show=False, n=N, nt=NT, block=BLOCK):
    mesh = make_mesh(axis_name="shard")  # all available devices
    n_dev = mesh.shape["shard"]
    print(f"mesh: {n_dev} device(s); n={n} (={n // n_dev} rows/device)")

    xi, zi, xt, zt_true = generate_data(n=n, nt=nt)
    model = gp.Model(constant_mean, kernel)

    # high-level fit: mesh= routes the REML criterion through
    # ShardedModelView (row-sharded gram + distributed blocked Cholesky)
    zi_np = np.asarray(zi)
    p0 = np.concatenate(
        [[np.log(np.var(zi_np))], [2 * np.log(0.05)],
         -np.log(np.std(np.asarray(xi), axis=0))]
    )
    model, info = gp.kernel.select_parameters_with_reml(
        model, xi, zi, covparam0=gnp.asarray(p0), info=True,
        mesh=mesh, shard_block=block, method="L-BFGS-B",
    )
    print("REML optimum:", np.round(np.asarray(model.covparam), 4),
          "| nll:", round(float(info.fun), 3))

    # the low-level criterion remains available for custom optimizers:
    vg = jax.jit(
        jax.value_and_grad(
            lambda p: sharded_negative_log_restricted_likelihood(
                model, p, xi, zi, mesh, block=block
            )
        )
    )
    v0, _g0 = vg(gnp.asarray(model.covparam))
    assert abs(float(v0) - float(info.fun)) < 1e-6

    zpm, zpv = sharded_predict(model, xi, zi, xt, mesh, block=block)
    zpm, zpv = np.asarray(zpm), np.asarray(zpv)
    rmse = float(np.sqrt(np.mean((zpm - zt_true) ** 2)))
    cov90 = float(
        np.mean(np.abs(zpm - zt_true) <= 1.645 * np.sqrt(np.maximum(zpv, 0)))
    )
    print(f"predict: rmse={rmse:.4f}, 90%-coverage={cov90:.3f}, "
          f"min var={zpv.min():.3e}")
    assert np.isfinite(zpm).all() and rmse < 5 * NOISE_STD
    return rmse


if __name__ == "__main__":
    main()
