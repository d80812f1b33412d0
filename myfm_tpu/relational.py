"""RelationBlock: compressed relational feature blocks (Rendle, VLDB'13).

A ``RelationBlock`` carries a small design matrix whose rows are *unique*
entities (e.g. one row per user) together with a mapper from each training
row to its entity row.  Training/prediction behave exactly as if the block
rows had been expanded (gathered) into the full design matrix, but the
samplers work on the compressed representation so that per-sweep cost is
O(nnz of the block) + O(n_rows), not O(nnz of the expanded matrix).

API parity with the reference implementation's ``myfm.RelationBlock``
(/root/reference/include/myfm/definitions.hpp:30-52 and
/root/reference/cpp_source/declare_module.hpp:95-116): attributes
``original_to_block``, ``data``, ``mapper_size``, ``block_size``,
``feature_size``; the constructor bounds-checks every mapper index.
"""

from __future__ import annotations

from typing import Iterable, Union

import numpy as np
from scipy import sparse as sps

ArrayLike = Union[np.ndarray, sps.spmatrix]


class RelationBlock:
    """Relational block of features shared by many training rows.

    Parameters
    ----------
    original_to_block:
        Integer array of length ``n_rows`` mapping each training row to a
        row of ``data``.
    data:
        Sparse (or dense) matrix of shape ``(block_size, feature_size)``
        holding the unique feature rows.
    """

    __slots__ = ("original_to_block", "data")

    def __init__(self, original_to_block: Iterable[int], data: ArrayLike):
        mapper = np.asarray(original_to_block, dtype=np.int64)
        if mapper.ndim != 1:
            raise ValueError("original_to_block must be one-dimensional.")
        csr = sps.csr_matrix(data)
        if mapper.size and (mapper.min() < 0 or mapper.max() >= csr.shape[0]):
            raise ValueError(
                "original_to_block contains an index outside "
                f"[0, {csr.shape[0]})."
            )
        self.original_to_block = mapper
        self.data = csr

    @property
    def mapper_size(self) -> int:
        return int(self.original_to_block.shape[0])

    @property
    def block_size(self) -> int:
        return int(self.data.shape[0])

    @property
    def feature_size(self) -> int:
        return int(self.data.shape[1])

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"RelationBlock(mapper_size={self.mapper_size}, "
            f"block_size={self.block_size}, feature_size={self.feature_size})"
        )

    # --- pickle support (parity with declare_module.hpp:117-124) ---
    def __getstate__(self):
        return {"original_to_block": self.original_to_block, "data": self.data}

    def __setstate__(self, state):
        self.original_to_block = state["original_to_block"]
        self.data = state["data"]
