"""Shim for environments whose pip/setuptools cannot do PEP-660 editable
installs (pip's build_editable path requires the `wheel` package, which the
build container deliberately lacks). `python setup.py develop` installs the
checkout in editable mode with zero extra packages; everything declarative
lives in pyproject.toml."""

from setuptools import setup

setup()
