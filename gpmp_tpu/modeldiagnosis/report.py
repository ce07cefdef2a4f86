# gpmp_tpu/modeldiagnosis/report.py
"""Model diagnosis report (reference gpmp/modeldiagnosis/report.py:37-256)."""

from typing import Any, Dict, Optional

import numpy as np

import gpmp_tpu.num as gnp
from gpmp_tpu.parameter import (
    param_from_covparam_anisotropic,
    param_from_covparam_anisotropic_noisy,
)
from .utils import describe_array, pretty_print_dictionnary


def modeldiagnosis_init(model, info, *, model_type="linear_mean_matern_anisotropic",
                        param_obj=None) -> Dict[str, Any]:
    """Build the diagnosis dict: selection summary, Param table with
    optimizer bounds projected onto the covariance entries."""
    md: Dict[str, Any] = {
        "optim_info": info,
        "param_selection": {},
        "parameters": {},
        "param_obj": None,
        "loo": {},
        "data": {},
    }

    md["param_selection"] = {
        "cvg_reached": info.success,
        "optimal_val": info.best_value_returned,
        "n_evals": info.nfev,
        "time": info.total_time,
        "initial_val": info.selection_criterion(info.initial_params),
        "final_val": info.fun,
    }

    def _apply_cov_bounds_to_param(pobj, cov_bounds):
        cov_bounds = np.asarray(cov_bounds, dtype=float)
        cov_inds = [
            j for j, pth in enumerate(pobj.paths) if pth and pth[0] == "covparam"
        ]
        if len(cov_inds) != cov_bounds.shape[0]:
            return pobj
        for dst_idx, (lo, hi) in zip(cov_inds, cov_bounds):
            if np.isinf(lo) and np.isinf(hi):
                pobj.bounds[dst_idx] = None
            else:
                pobj.bounds[dst_idx] = (float(lo), float(hi))
        return pobj

    if param_obj is None:
        covparam = np.asarray(gnp.to_np(gnp.asarray(model.covparam)))
        builders = {
            "linear_mean_matern_anisotropic": param_from_covparam_anisotropic,
            "linear_mean_matern_anisotropic_noisy":
                param_from_covparam_anisotropic_noisy,
        }
        builder = builders.get(model_type)
        if builder is None:
            raise ValueError(f"Unknown model type: {model_type}")
        param_obj = builder(covparam, None, None, name_prefix="")

    bounds_arr = getattr(info, "bounds", None)
    if bounds_arr is not None:
        if getattr(model, "meanparam", None) is None:
            mpl = 0
        else:
            mpl = int(np.asarray(gnp.to_np(gnp.asarray(model.meanparam)))
                      .reshape(-1).shape[0])
        cov_len = int(np.asarray(gnp.to_np(gnp.asarray(model.covparam)))
                      .reshape(-1).shape[0])
        bounds_arr = np.asarray(bounds_arr, dtype=float)
        if (
            bounds_arr.ndim == 2
            and bounds_arr.shape[1] == 2
            and bounds_arr.shape[0] >= mpl + cov_len
        ):
            param_obj = _apply_cov_bounds_to_param(
                param_obj, bounds_arr[mpl : mpl + cov_len]
            )

    md["parameters"] = param_obj.to_simple_dict()
    md["param_obj"] = param_obj
    return md


def model_diagnosis_disp(md, xi, zi, *,
                         model_type="linear_mean_matern_anisotropic") -> None:
    """Print the report: selection summary, Param table, data description
    with delta/sigma columns."""
    _ = model_type
    xi = np.asarray(gnp.to_np(gnp.asarray(xi)))
    zi = np.asarray(gnp.to_np(gnp.asarray(zi)))

    print("[Model diagnosis]")
    print("  * Parameter selection")
    pretty_print_dictionnary(md["param_selection"])

    print("  * Parameters")
    print("\n".join("    " + line for line in str(md["param_obj"]).splitlines()))

    print("  * Data")
    print("    {:>0}: {:d}".format("count", int(zi.shape[0])))
    print("    -----")

    param_values = np.array(list(md["parameters"].values()), dtype=float)

    rownames_zi = (
        ["zi"] if zi.ndim == 1 else [f"zi_{j}" for j in range(int(zi.shape[1]))]
    )
    df_zi = describe_array(zi, rownames_zi, 1.0 / param_values[0])

    d = int(xi.shape[1])
    df_xi = describe_array(xi, [f"xi_{j}" for j in range(d)],
                           1.0 / param_values[-d:])
    print(df_zi.concat(df_xi))


def diag(model, info_select_parameters, xi, zi, *,
         model_type="linear_mean_matern_anisotropic", param_obj=None) -> None:
    """Build and display a model diagnosis report."""
    md = modeldiagnosis_init(
        model, info_select_parameters, model_type=model_type, param_obj=param_obj
    )
    model_diagnosis_disp(md, xi, zi, model_type=model_type)


__all__ = ["modeldiagnosis_init", "model_diagnosis_disp", "diag"]
