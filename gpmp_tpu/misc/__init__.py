# gpmp_tpu/misc/__init__.py
"""Miscellaneous utilities: designs, test functions, scoring rules, tables."""

from . import dataframe, designs, profiling, scoringrules, testfunctions

__all__ = ["dataframe", "designs", "profiling", "scoringrules", "testfunctions"]
