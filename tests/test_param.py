# tests/test_param.py
"""Param object tests (reference tests/test_param.py coverage)."""

import numpy as np
import pytest

from gpmp_tpu.parameter import (
    Normalization,
    Param,
    make_anisotropic_param,
    param_from_covparam_anisotropic,
    param_from_covparam_anisotropic_noisy,
)


def test_construction_defaults():
    p = Param(values=[1.0, 2.0, 3.0])
    assert p.dim == 3
    assert p.names == ["param_0", "param_1", "param_2"]
    assert all(n == Normalization.NONE for n in p.normalizations)


def test_normalization_roundtrip():
    p = make_anisotropic_param(values=[np.log(2.0), -np.log(0.5), -np.log(1.5)])
    dv = p.denormalized_values
    np.testing.assert_allclose(dv, [2.0, 0.5, 1.5], rtol=1e-12)
    p.denormalized_values = [4.0, 0.25, 3.0]
    np.testing.assert_allclose(
        p.values, [np.log(4.0), -np.log(0.25), -np.log(3.0)], rtol=1e-12
    )


def test_get_set_by_name_and_path():
    p = make_anisotropic_param(d=2)
    p.set_by_name("sigma2", 1.5)
    assert p.get_by_name("sigma2") == 1.5
    rho_vals = p.get_by_path(["covparam", "lengthscale"])
    assert rho_vals.shape == (2,)
    p.set_by_path(["covparam", "lengthscale"], [0.3, 0.4])
    np.testing.assert_allclose(p.get_by_path(["covparam", "lengthscale"]),
                               [0.3, 0.4])


def test_view_vs_copy():
    p = make_anisotropic_param(d=2)
    view = p.get_by_path(["covparam", "lengthscale"], return_view=True)
    view[0] = 9.0
    assert p.values[1] == 9.0  # view mutates
    cpy = p.get_by_path(["covparam", "lengthscale"])
    cpy[0] = -1.0
    assert p.values[1] == 9.0  # copy does not


def test_bounds_check():
    p = make_anisotropic_param(
        values=[np.log(2.0), 0.0], logsigma2_bounds=(1.0, 3.0),
        loginvrho_bounds=(0.5, 2.0),
    )
    checks = p.check_bounds()
    assert checks[0] is True  # sigma2 = 2 in [1, 3]
    assert checks[1] is True  # rho = 1 in [0.5, 2]


def test_concat_and_slice():
    p1 = make_anisotropic_param(d=1, name_prefix="a_")
    p2 = make_anisotropic_param(d=1, name_prefix="b_")
    pc = p1 + p2
    assert pc.dim == 4
    assert pc.names == ["a_sigma2", "a_rho_0", "b_sigma2", "b_rho_0"]
    sl = pc[1:3]
    assert sl.dim == 2
    assert sl.names == ["a_rho_0", "b_sigma2"]


def test_noisy_variant():
    p = param_from_covparam_anisotropic_noisy([0.0, -1.0, 0.5, 0.2])
    assert p.names[:2] == ["sigma2", "sigma2_noise"]
    assert p.normalizations[0] == Normalization.LOG
    assert p.normalizations[2] == Normalization.LOG_INV


def test_repr_table():
    p = param_from_covparam_anisotropic([0.0, 0.5])
    s = repr(p)
    assert "sigma2" in s and "rho_0" in s and "Denorm" in s


def test_to_simple_dict():
    p = param_from_covparam_anisotropic([np.log(4.0), -np.log(2.0)])
    d = p.to_simple_dict()
    np.testing.assert_allclose(d["sigma2"], 4.0, rtol=1e-12)
    np.testing.assert_allclose(d["rho_0"], 2.0, rtol=1e-12)
