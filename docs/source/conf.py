# Sphinx configuration for gpmp_tpu documentation.
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "gpmp_tpu"
copyright = "2026, gpmp_tpu developers"
author = "gpmp_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "alabaster"
autodoc_member_order = "bysource"
