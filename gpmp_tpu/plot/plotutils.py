# gpmp_tpu/plot/plotutils.py
"""Plotting utilities: Figure wrapper, GP CI bands, cross-sections, LOO plot.

API parity with /root/reference/gpmp/plot/plotutils.py:20-420.
Host-side matplotlib; headless-safe (Agg backend when non-interactive).
"""

import sys

import numpy as np
import scipy.stats as stats

import matplotlib

if not hasattr(sys, "ps1") and not sys.flags.interactive:
    try:
        matplotlib.use("Agg", force=False)
    except Exception:
        pass
import matplotlib.pyplot as plt
from matplotlib import interactive

import gpmp_tpu.num as gnp


class Figure:
    """Small matplotlib figure manager with box-off styling and subplots."""

    def __init__(self, nrows=1, ncols=1, isinteractive=True, boxoff=True, **kargs):
        self.interpreter = False
        try:
            if sys.ps1:
                self.interpreter = True
        except AttributeError:
            if sys.flags.interactive:
                self.interpreter = True

        if isinteractive and self.interpreter:
            interactive(True)

        self.boxoff = boxoff
        self.fig = plt.figure(**kargs)
        self.nrows = nrows
        self.ncols = ncols
        self.axes = [
            self.fig.add_subplot(nrows, ncols, i + 1) for i in range(nrows * ncols)
        ]
        self.ax = self.axes[0]
        if self.boxoff:
            self.set_boxoff()

    def set_boxoff(self):
        self.ax.spines["right"].set_visible(False)
        self.ax.spines["top"].set_visible(False)
        self.ax.tick_params(direction="in")

    def subplot(self, i):
        self.ax = self.axes[i - 1]
        if self.boxoff:
            self.set_boxoff()

    def show(self, grid=None, legend=None, legend_fontsize=None, xlim=None):
        if grid:
            self.grid()
        if legend and legend_fontsize is not None:
            self.legend(fontsize=legend_fontsize)
        elif legend:
            self.legend()
        if xlim is not None:
            self.xlim(xlim)
        plt.show()

    def plot(self, x, z, *args, **kargs):
        self.ax.plot(np.asarray(x), np.asarray(z), *args, **kargs)

    def plotdata(self, x, z, label="data"):
        self.ax.plot(
            np.asarray(x), np.asarray(z), "rs",
            markerfacecolor="none", markersize=6, label=label,
        )

    def xlabel(self, s):
        self.ax.set_xlabel(s)

    def ylabel(self, s):
        self.ax.set_ylabel(s)

    def xylabels(self, sx="", sy=""):
        self.ax.set_xlabel(sx)
        self.ax.set_ylabel(sy)

    def title(self, s):
        self.ax.set_title(s)

    def legend(self, **kwargs):
        self.ax.legend(**kwargs)

    def grid(self, visible=True, which="major", linestyle=(0, (1, 5)),
             linewidth=0.5, **kwargs):
        self.ax.grid(visible, which, linestyle=linestyle, linewidth=linewidth,
                     **kwargs)

    def xlim(self, new_limits=None):
        if new_limits is None:
            return self.ax.get_xlim()
        self.ax.set_xlim(new_limits)
        return new_limits

    def ylim(self, new_limits=None):
        if new_limits is None:
            return self.ax.get_ylim()
        self.ax.set_ylim(new_limits)
        return new_limits

    def axhline(self, y, **kwargs):
        self.ax.axhline(y, **kwargs)

    def axvline(self, x, **kwargs):
        self.ax.axvline(x, **kwargs)

    def plotgp(
        self,
        x,
        mean,
        variance,
        colorscheme="default",
        rgb_hue=None,
        ax=None,
        fignum=None,
        mean_label="posterior mean",
        show_mean_label=True,
        ci=(0.95, 0.99, 0.999),
        ci_labels=("CI 95%", "CI 99%", "CI 99.9%"),
        show_ci_labels=True,
        **kwargs,
    ):
        """Posterior mean with Gaussian coverage-interval bands.

        Colorschemes: 'default' (3 nested gray bands), 'simple' (one band),
        'bw' (edge lines), 'hue' (custom RGB fill).
        """
        if not show_mean_label:
            mean_label = ""
        ci_labels = list(ci_labels)
        if not show_ci_labels:
            ci_labels = [""] * 3

        x = np.asarray(gnp.to_np(x)).flatten()
        mean = np.asarray(gnp.to_np(mean)).flatten()
        variance = np.asarray(gnp.to_np(variance)).flatten()

        delta0 = [stats.norm.ppf((1 + level) / 2) for level in ci]
        drawulb = False
        edgecol = "#000000"

        if colorscheme == "hue":
            hex_code = "#" + "".join(format(i, "02x") for i in rgb_hue)
            mcol, mwidth = hex_code, 2.0
            delta0, ci_labels = [delta0[0]], [ci_labels[0]]
            fillcol, alpha = [hex_code], 0.5
            kwargs["linewidth"] = 0.5
        elif colorscheme == "bw":
            mcol, mwidth = "#000000", 2.0
            delta0, ci_labels = [delta0[0]], [ci_labels[0]]
            fillcol, alpha = ["#F2F2F2"], 0.0
            drawulb = True
        elif colorscheme == "simple":
            mcol, mwidth = "#F2404C", 2.0
            delta0, ci_labels = [delta0[0]], [ci_labels[0]]
            fillcol, alpha = ["#BFBFBF"], 0.8
            kwargs["linewidth"] = 0.5
        else:  # default
            mcol, mwidth = "#F2404C", 2.0
            delta0, ci_labels = delta0[::-1], ci_labels[::-1]
            fillcol, alpha = ["#F2F2F2", "#D8D8D8", "#BFBFBF"], 0.8
            kwargs["linewidth"] = 0.5

        self.ax.plot(x, mean, mcol, linewidth=mwidth, label=mean_label)

        for i, delta in enumerate(delta0):
            kwargs["alpha"] = alpha
            lower = mean - delta * np.sqrt(variance)
            upper = mean + delta * np.sqrt(variance)
            self.ax.fill(
                np.hstack((x, x[::-1])),
                np.hstack((upper, lower[::-1])),
                color=fillcol[i],
                label=ci_labels[i],
                **kwargs,
            )
            if drawulb:
                for curve in (upper, lower):
                    self.ax.plot(
                        x, curve, color=edgecol, linestyle="dashed",
                        dashes=(10, 8), linewidth=0.5,
                    )


def crosssections(model, xi, zi, box, ind_i=None, ind_dim=None, nt=100,
                  show_data=True, figsize=None):
    """Prediction cross-sections: sweep one coordinate from an anchor
    observation, plotting posterior mean + CI along each slice."""
    xi_np = np.asarray(gnp.to_np(gnp.asarray(xi)))
    zi_np = np.asarray(gnp.to_np(gnp.asarray(zi)))
    box = np.asarray(box, dtype=float)
    nt = int(nt)

    if xi_np.ndim != 2:
        raise ValueError("xi must have shape (n, d).")
    if box.shape != (2, xi_np.shape[1]):
        raise ValueError("box must have shape (2, d).")
    if zi_np.shape[0] != xi_np.shape[0] or zi_np.size != xi_np.shape[0]:
        raise ValueError("zi must be scalar-valued with shape (n,) or (n, 1).")
    if nt < 2:
        raise ValueError("nt must be >= 2.")

    zi_vec = zi_np.reshape(-1)

    if ind_i is None:
        ind_i = "min"
    if isinstance(ind_i, str):
        if ind_i == "min":
            ind_i = [int(np.nanargmin(zi_vec))]
        elif ind_i == "max":
            ind_i = [int(np.nanargmax(zi_vec))]
        else:
            raise ValueError(
                "ind_i must be None, 'min', 'max', an int, or a sequence."
            )
    elif np.isscalar(ind_i):
        ind_i = [int(ind_i)]
    else:
        ind_i = [int(i) for i in ind_i]

    if ind_dim is None:
        ind_dim = list(range(xi_np.shape[1]))
    elif np.isscalar(ind_dim):
        ind_dim = [int(ind_dim)]
    else:
        ind_dim = [int(d) for d in ind_dim]

    num_cs, num_dims = len(ind_i), len(ind_dim)
    if figsize is None:
        figsize = (4.8 * num_cs, 2.4 * num_dims)

    fig = Figure(num_dims, num_cs, figsize=figsize)

    for i in range(num_cs):
        anchor = ind_i[i]
        if not (0 <= anchor < xi_np.shape[0]):
            raise IndexError("ind_i contains an out-of-bounds observation index.")
        for d in range(num_dims):
            dim_idx = ind_dim[d]
            if not (0 <= dim_idx < xi_np.shape[1]):
                raise IndexError("ind_dim contains an out-of-bounds dimension index.")

            t = np.sort(
                np.concatenate(
                    (
                        np.linspace(box[0, dim_idx], box[1, dim_idx], nt - 1),
                        [xi_np[anchor, dim_idx]],
                    )
                )
            )
            xt = np.tile(xi_np[anchor, :], (nt, 1))
            xt[:, dim_idx] = t
            zpm, zpv = model.predict(xi, zi, gnp.asarray(xt))
            zpm = np.asarray(gnp.to_np(zpm)).reshape(-1)
            zpv = np.maximum(np.asarray(gnp.to_np(zpv)).reshape(-1), 0.0)

            fig.subplot(num_cs * d + i + 1)
            first = i == 0 and d == 0
            fig.plotgp(t, zpm, zpv, show_mean_label=first, show_ci_labels=first)
            if show_data:
                fig.ax.plot(
                    xi_np[:, dim_idx], zi_vec, "ko", alpha=0.25, markersize=3,
                    label="projected observations" if first else None,
                )
                fig.ax.plot(
                    xi_np[anchor, dim_idx], zi_vec[anchor], "ro", markersize=5,
                    label="anchor" if first else None,
                )
            fig.ax.axvline(xi_np[anchor, dim_idx], color="k", linestyle=":",
                           linewidth=1)
            fig.grid()
            fig.ax.set_xlabel(rf"$x_{dim_idx:d}$")
            if i == 0:
                fig.ax.set_ylabel(rf"$z$ along $x_{dim_idx:d}$")
            if d == 0:
                fig.ax.set_title(f"cross section {i + 1:d}")
            if first and show_data:
                fig.ax.legend(fontsize=8)

    fig.fig.tight_layout()
    return fig


def plot_loo(zi, zloom, zloov):
    """LOO predicted-vs-true with 95% coverage error bars."""
    fig = Figure()
    zi = np.asarray(gnp.to_np(zi))
    zloom = np.asarray(gnp.to_np(zloom))
    zloov = np.asarray(gnp.to_np(zloov))
    fig.ax.errorbar(zi, zloom, 1.96 * np.sqrt(zloov), fmt="ko", ls="None")
    fig.ax.set_xlabel("true values")
    fig.ax.set_ylabel("predicted")
    fig.ax.set_title("LOO predictions with 95% coverage intervals")
    (xmin, xmax), (ymin, ymax) = fig.ax.get_xlim(), fig.ax.get_ylim()
    lo, hi = min(xmin, ymin), max(xmax, ymax)
    fig.ax.plot([lo, hi], [lo, hi], "--")
    fig.ax.grid(True, "major", linestyle=(0, (1, 5)), linewidth=0.5)
    fig.show()
