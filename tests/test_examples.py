# tests/test_examples.py
"""Example smoke tests: full-pipeline coverage (reference
tests/test_examples.py strategy) -- every example module's main() runs.

All examples are main()-gated (improvement over the reference, whose
examples 07 and 23 ran at import and had to be excluded).
"""

import importlib
import os
import sys

import matplotlib
import pytest

matplotlib.use("Agg")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EXAMPLES = [
    "examples.gpmp_tpu_example01_materncov",
    "examples.gpmp_tpu_example02_1d_interpolation",
    "examples.gpmp_tpu_example03_2d",
    "examples.gpmp_tpu_example04_nd",
    "examples.gpmp_tpu_example05_1d_custom_kernel",
    "examples.gpmp_tpu_example06_1d_regression",
    "examples.gpmp_tpu_example07_nd_regression",
    "examples.gpmp_tpu_example10_sample_paths",
    "examples.gpmp_tpu_example11_sample_paths_noisy_obs",
    "examples.gpmp_tpu_example20_1d_interpolation_variation_remap",
    "examples.gpmp_tpu_example21_1d_interpolation_variation_reml",
    "examples.gpmp_tpu_example22_1d_interpolation_variation_ml",
    "examples.gpmp_tpu_example23_1d_interpolation_posterior_sampling",
    "examples.gpmp_tpu_example30_dataloader",
    "examples.gpmp_tpu_example40_sharded_large_n",
    "examples.gpmp_tpu_example41_mixed_engine",
]

# lighter budgets for the slow examples in CI
_KWARGS = {
    "examples.gpmp_tpu_example04_nd": dict(ni=60, nt=200),
    "examples.gpmp_tpu_example07_nd_regression": dict(problem=1),
    "examples.gpmp_tpu_example20_1d_interpolation_variation_remap":
        dict(n_repeat=2),
    "examples.gpmp_tpu_example21_1d_interpolation_variation_reml":
        dict(n_repeat=2),
    "examples.gpmp_tpu_example22_1d_interpolation_variation_ml":
        dict(n_repeat=2),
    "examples.gpmp_tpu_example23_1d_interpolation_posterior_sampling": dict(
        n_steps_total=600, burnin=300, num_samples=80, num_warmup=60
    ),
    "examples.gpmp_tpu_example30_dataloader": dict(ni=400, batch_size=100),
    "examples.gpmp_tpu_example40_sharded_large_n": dict(n=512, nt=128,
                                                        block=64),
}


@pytest.mark.parametrize("module_name", EXAMPLES)
def test_example_runs(module_name):
    mod = importlib.import_module(module_name)
    kwargs = _KWARGS.get(module_name, {})
    mod.main(show=False, **kwargs)
