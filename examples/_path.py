"""Make the repo-root ``myfm_tpu`` package importable from examples/
without installation (this environment forbids writing outside the
repo, so no ``pip install -e .``)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
