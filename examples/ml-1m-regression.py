"""MovieLens-1M benchmark (counterpart of reference
examples/ml-1m-regression.py): identical protocol to the ML-10M Rendle
evaluation but on the 1M dataset — 10-fold CV, relational feature
blocks, streaming libFM-style evaluation.

Thin front-end over ``ml-10m-regression.py`` with ``--scale 1m``; all
of its flags (``-a/-i/-d/-f/--synthetic``) apply here too.
"""

import sys

if __name__ == "__main__":
    sys.argv += ["--scale", "1m"]
    exec(
        open(__file__.replace("ml-1m-", "ml-10m-")).read(),
        {"__name__": "__main__", "__file__":
         __file__.replace("ml-1m-", "ml-10m-")},
    )
