"""Variational coordinate-ascent ops (filled in by the VI milestone)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class VariationalConfig:
    task: str = "regression"
    alpha_0: float = 1.0
    beta_0: float = 1.0
    gamma_0: float = 1.0
    mu_0: float = 0.0
    reg_0: float = 1.0
    fit_w0: bool = True
    fit_linear: bool = True
