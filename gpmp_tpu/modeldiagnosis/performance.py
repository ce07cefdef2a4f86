# gpmp_tpu/modeldiagnosis/performance.py
"""Predictive performance metrics (reference performance.py:50-254).

LOO metrics: PRESS, Q2, RMSE, RMSE/std, log10(PRESS/TSS); test metrics:
RSS, R2, ...; optional PIT via the Gaussian cdf.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np

import gpmp_tpu.num as gnp
from gpmp_tpu.misc.dataframe import DataFrame


def _as_1d(x):
    return gnp.asarray(x).reshape(-1)


def compute_performance(model, xi, zi, loo=True, loo_res=None, xtzt=None,
                        zpmzpv=None, compute_pit=False) -> Dict[str, Any]:
    """LOO and optional test-set performance metrics as a dict."""
    xi = gnp.asarray(xi)
    zi_arr = gnp.asarray(zi)
    zi_vec = _as_1d(zi_arr)

    out: Dict[str, Any] = {}

    if loo:
        if loo_res is None:
            zloom, zloov, eloo = model.loo(xi, zi_arr)
        else:
            zloom, zloov, eloo = loo_res

        eloo_vec = _as_1d(eloo)
        n = int(zi_vec.shape[0])

        tss = gnp.norm(zi_vec - gnp.mean(zi_vec), ord=2) ** 2
        press = gnp.norm(eloo_vec, ord=2) ** 2
        press_over_tss = press / tss
        rmse = gnp.sqrt(press / float(max(n, 1)))
        std = gnp.std(zi_vec)

        out["loo_n"] = n
        out["loo_std"] = std
        out["loo_tss"] = tss
        out["loo_press"] = press
        out["loo_press_over_tss"] = press_over_tss
        out["loo_log10_press_over_tss"] = gnp.log10(press_over_tss)
        out["loo_rmse"] = rmse
        out["loo_rmse_over_std"] = rmse / std
        out["loo_Q2"] = 1 - press / tss

        if compute_pit:
            scale = gnp.sqrt(gnp.clip(gnp.asarray(zloov), 0.0, gnp.inf))
            out["loo_pit"] = gnp.normal.cdf(zi_arr, loc=zloom, scale=scale)

    if xtzt is not None:
        xt, zt = xtzt
        xt = gnp.asarray(xt)
        zt_arr = gnp.asarray(zt)
        zt_vec = _as_1d(zt_arr)

        if zpmzpv is None:
            zpm, zpv = model.predict(xi, zi_arr, xt)
        else:
            zpm, zpv = zpmzpv
        zpm = gnp.asarray(zpm)
        zpv = gnp.asarray(zpv)

        zpm_vec = _as_1d(zpm)
        n = int(zt_vec.shape[0])

        tss = gnp.norm(zt_vec - gnp.mean(zt_vec), ord=2) ** 2
        rss = gnp.norm(zt_vec - zpm_vec, ord=2) ** 2
        rss_over_tss = rss / tss
        rmse = gnp.sqrt(rss / float(max(n, 1)))
        std = gnp.std(zt_vec)

        out["test_n"] = n
        out["test_std"] = std
        out["test_tss"] = tss
        out["test_rss"] = rss
        out["test_rss_over_tss"] = rss_over_tss
        out["test_log10_rss_over_tss"] = gnp.log10(rss_over_tss)
        out["test_rmse"] = rmse
        out["test_rmse_over_std"] = rmse / std
        out["test_R2"] = 1 - rss / tss

        if compute_pit:
            scale = gnp.sqrt(gnp.clip(zpv, 0.0, gnp.inf))
            out["test_pit"] = gnp.normal.cdf(zt_arr, loc=zpm, scale=scale)

    return out


def _section_dataframe(title, n, rows):
    rownames = list(rows.keys())
    data = np.asarray(
        [float(gnp.to_np(gnp.asarray(rows[k]))) for k in rownames], dtype=float
    ).reshape(-1, 1)
    df = DataFrame(data, ["value"], rownames)
    print(f"{title} (n={n:d})")
    print(df)


def perf(model, xi, zi, loo=True, loo_res=None, xtzt=None, zpmzpv=None) -> None:
    """Print compute_performance() results (PIT omitted)."""
    p = compute_performance(
        model, xi, zi, loo=loo, loo_res=loo_res, xtzt=xtzt, zpmzpv=zpmzpv,
        compute_pit=False,
    )

    print("[Prediction performances]")

    if loo and "loo_press" in p:
        rows = {
            "std(z)": p["loo_std"],
            "tss": p["loo_tss"],
            "press": p["loo_press"],
            "press/tss": p["loo_press_over_tss"],
            "log10(press/tss)": p["loo_log10_press_over_tss"],
            "rmse": p["loo_rmse"],
            "rmse/std(z)": p["loo_rmse_over_std"],
            "Q2": p["loo_Q2"],
        }
        _section_dataframe("  LOO", int(p["loo_n"]), rows)

    if xtzt is not None and "test_rss" in p:
        rows = {
            "std(z)": p["test_std"],
            "tss": p["test_tss"],
            "rss": p["test_rss"],
            "rss/tss": p["test_rss_over_tss"],
            "log10(rss/tss)": p["test_log10_rss_over_tss"],
            "rmse": p["test_rmse"],
            "rmse/std(z)": p["test_rmse_over_std"],
            "R2": p["test_R2"],
        }
        _section_dataframe("  Test", int(p["test_n"]), rows)


__all__ = ["compute_performance", "perf"]
