"""Plot Matern covariance functions for several regularities.

Mirror of reference examples/gpmp_example01_materncov.py on gpmp_tpu.
"""

import gpmp_tpu as gp
import gpmp_tpu.num as gnp


def main(show=False):
    h = gnp.linspace(-2.0, 2.0, 500)

    fig = gp.plot.Figure(isinteractive=show)
    for p in [0, 1, 4]:
        r = gp.kernel.maternp_kernel(p, gnp.abs(h))
        fig.plot(h, r, label=f"p={p} / nu={2 * p + 1}/2")
    fig.title("Matern covariances")
    fig.xlabel("h")
    fig.ylabel(r"$k_{p+1/2}(h)$")
    fig.legend()
    if show:
        fig.show(grid=True)
    return fig


if __name__ == "__main__":
    main(show=True)
