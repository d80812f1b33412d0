"""Ordinal-probit toy example (counterpart of reference
examples/oprobit_example.py): a rank-0 cumulative-probit regression on
a 1-D latent score with known cutpoints, the setup statsmodels'
``MCMCoprobit`` is typically benchmarked on.  The reference reports
~40x speedup over MCMCpack at 11k iterations; here the whole chain is
one jitted XLA program."""

import _path  # noqa: F401  (repo-root import shim)

import time

import numpy as np
import scipy.sparse as sps

from myfm_tpu import MyFMOrderedProbit

rng = np.random.RandomState(0)
N = 2000
x = rng.normal(size=N)
z = 1.2 * x + rng.normal(size=N)
cutpoints = [-0.5, 0.5, 1.5]
y = np.digitize(z, cutpoints)

X = sps.csr_matrix(x[:, None])
fm = MyFMOrderedProbit(rank=0, random_seed=42)
t0 = time.time()
fm.fit(X, y, n_iter=200, n_kept_samples=100)
elapsed = time.time() - t0

probs = fm.predict_proba(X)
acc = float((probs.argmax(axis=1) == y).mean())
print(f"fit 200 iters in {elapsed:.1f}s; accuracy={acc:.3f}")
print("posterior-mean cutpoints:",
      np.asarray(fm.cutpoint_samples).mean(axis=0),
      "(true:", cutpoints, ")")

# -- multiple cutpoint groups ----------------------------------------
# Two raters discretize the same latent score on different scales; each
# group gets its own independent cutpoint sampler sharing one FM (a
# capability of the reference's C++ engine its Python layer never
# exposed — see docs/ordinal-regression.md).
even = np.arange(N) % 2 == 0
y2 = np.where(even, np.digitize(z, cutpoints),
              np.digitize(z, [0.0]))  # group 1: binary scale
groups = [(4, np.where(even)[0].tolist()),
          (2, np.where(~even)[0].tolist())]
fm2 = MyFMOrderedProbit(rank=0, random_seed=42)
fm2.fit(X, y2, n_iter=100, n_kept_samples=50, cutpoint_groups=groups)
print("group 0 cutpoints:",
      np.round(fm2.get_cutpoint_samples(0).mean(axis=0), 2),
      "(true:", cutpoints, ")")
print("group 1 cutpoint:",
      np.round(fm2.get_cutpoint_samples(1).mean(axis=0), 2),
      "(true: [0.0] ); accepts per group:", fm2.history_.n_mh_accept)
