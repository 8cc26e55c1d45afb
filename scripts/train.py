"""Thin launcher shim; the implementation is visualdet3d_tpu.cli.train.

Works uninstalled (repo checkout) and installed (prefer `vd3d` console
scripts from pyproject.toml).
"""
import os
import sys

try:
    from visualdet3d_tpu.cli.train import main
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from visualdet3d_tpu.cli.train import main

if __name__ == '__main__':
    main()
