"""Independent numpy oracle for the FM forward pass used by all tests."""

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sps


@dataclass
class FMWeights:
    w0: float
    w: np.ndarray  # [F]
    V: np.ndarray  # [F, R]


def fm_oracle_score(X: sps.spmatrix, weights: FMWeights) -> np.ndarray:
    """ŷ = w0 + Xw + ½[(XV)² − X²V²] per row, straight from the math."""
    X = sps.csr_matrix(X)
    X2 = X.power(2)
    out = np.full(X.shape[0], weights.w0, dtype=np.float64)
    out += X @ weights.w
    q = X @ weights.V  # [N, R]
    qs = X2 @ (weights.V**2)
    out += 0.5 * (q**2 - qs).sum(axis=1)
    return out


def expand_blocks(X, blocks):
    """Densified design: hstack of X and each block's rows gathered
    through its mapper — the semantics RelationBlocks compress."""
    mats = []
    if X is not None:
        mats.append(sps.csr_matrix(X))
    for b in blocks:
        mats.append(sps.csr_matrix(b.data)[b.original_to_block])
    return sps.hstack(mats).tocsr() if len(mats) > 1 else mats[0]
