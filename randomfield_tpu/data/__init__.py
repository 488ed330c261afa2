"""Bundled data tables (default_power.dat: sigma8-normalized EH98 P(k)).

This package marker makes setuptools' ``packages.find`` include the data
directory so the ``package-data`` mapping in pyproject.toml ships
``*.dat`` files in wheels.
"""
