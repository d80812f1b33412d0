"""VI training loop (filled in by the variational milestone)."""

from __future__ import annotations


class VariationalTrainer:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "variational inference is implemented in a later milestone"
        )
