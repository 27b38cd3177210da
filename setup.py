"""Legacy setup shim so `pip install -e . --no-use-pep517` works in
environments without the `wheel` package (PEP 660 editable installs need it;
this one only needs setuptools).  All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
