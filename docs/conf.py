# Sphinx configuration for the rectipy_tpu documentation site.
#
# Reference analog: /root/reference/documentation/doc (Sphinx + gallery).
# The site builds from the markdown sources in this directory via
# myst-parser; the runnable example gallery lives in ../examples (each
# script is self-contained and smoke-tested in tests/test_examples_smoke.py).
#
# Build:  pip install sphinx myst-parser furo && make -C docs html

project = "rectipy_tpu"
author = "rectipy_tpu developers"
copyright = "2026, rectipy_tpu developers"

extensions = [
    "myst_parser",
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
master_doc = "index"
exclude_patterns = ["_build"]

html_theme = "furo"
html_title = "rectipy_tpu"

autodoc_member_order = "bysource"
napoleon_google_docstring = True
napoleon_numpy_docstring = True
