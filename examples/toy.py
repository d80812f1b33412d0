"""Minimal example (counterpart of reference examples/toy.py): a
4-row categorical regression through sklearn's DictVectorizer."""

import _path  # noqa: F401  (repo-root import shim)

import myfm_tpu as myfm

try:
    from sklearn.feature_extraction import DictVectorizer
except ImportError:  # environments without sklearn
    DictVectorizer = None

import numpy as np
import scipy.sparse as sps

train = [
    {"user": "1", "item": "5", "age": 19},
    {"user": "2", "item": "43", "age": 33},
    {"user": "3", "item": "20", "age": 55},
    {"user": "4", "item": "10", "age": 20},
]
y_train = np.asarray([0, 1, 1, 0], dtype=np.float64)

if DictVectorizer is not None:
    v = DictVectorizer()
    X_train = v.fit_transform(train)
    X_test = v.transform([{"user": "5", "item": "10", "age": 1}])
else:
    # hand-rolled one-hot fallback: [age | item one-hot | user one-hot]
    items = ["5", "43", "20", "10"]
    users = ["1", "2", "3", "4"]
    rows = []
    for d in train:
        row = [d["age"]] + [float(d["item"] == i) for i in items]
        row += [float(d["user"] == u) for u in users]
        rows.append(row)
    X_train = sps.csr_matrix(np.asarray(rows))
    X_test = sps.csr_matrix(
        np.asarray([[1.0] + [float("10" == i) for i in items] + [0.0] * 4])
    )

fm = myfm.MyFMRegressor(rank=4)
fm.fit(X_train, y_train, n_iter=200, n_kept_samples=200)
print("prediction:", fm.predict(X_test))
