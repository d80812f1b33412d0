"""libFM-style evaluation callbacks (parity with reference
src/myfm/utils/callbacks/__init__.py:1-13)."""

from .libfm import (
    ClassificationCallback,
    LibFMLikeCallbackBase,
    OrderedProbitCallback,
    RegressionCallback,
)

__all__ = [
    "LibFMLikeCallbackBase",
    "RegressionCallback",
    "ClassificationCallback",
    "OrderedProbitCallback",
]
