"""Ordered-probit cutpoint sampler (Albert & Chib Metropolis-within-Gibbs).

TPU re-implementation of /root/reference/include/myfm/OProbitSampler.hpp.
Filled in by the ordered-probit milestone; this module currently hosts
the state-initialization entry point used by the trainer.
"""

from __future__ import annotations


def initialize_oprobit_state(plan, state, y_int, cfg, key):
    raise NotImplementedError(
        "ordered probit is implemented in a later milestone"
    )
