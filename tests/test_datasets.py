"""Dataset-manager behavior with mocked consent + synthetic zips
(reference test strategy: tests/dataset/test_ml1m.py:14-41,
test_ml100k.py:8-49 — no network access is ever required)."""

import zipfile
from io import StringIO

import numpy as np
import pandas as pd
import pytest

from myfm_tpu.utils.benchmark_data import MovieLens1MDataManager
from myfm_tpu.utils.benchmark_data.loader_base import (
    train_test_split_with_kfold,
)
from myfm_tpu.utils.dummy_data import gen_dummy_rating_df


def _write_ml1m_zip(path, df):
    buf = StringIO()
    for row in df.itertuples(index=False):
        ts = int(pd.Timestamp(row.timestamp).timestamp())
        buf.write(
            f"{row.userId}::{row.itemId}::{row.rating}::{ts}\n"
        )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("ml-1m/ratings.dat", buf.getvalue())


def test_ml1m_refusal_raises(tmp_path, monkeypatch):
    """Refusing the download consent prompt aborts with RuntimeError
    (reference DataLoaderBase contract)."""
    monkeypatch.setattr("builtins.input", lambda *_: "n")
    with pytest.raises(RuntimeError):
        MovieLens1MDataManager(tmp_path / "missing.zip")


def test_ml1m_parse_fidelity(tmp_path):
    """A synthetic '::'-separated zip parses back to the source frame."""
    df = gen_dummy_rating_df(random_seed=3, size=120)
    zippath = tmp_path / "ml-1m.zip"
    _write_ml1m_zip(zippath, df)

    man = MovieLens1MDataManager(zippath)  # exists -> no prompt
    got = man.load_rating_all()
    np.testing.assert_array_equal(got.user_id.values, df.userId.values)
    np.testing.assert_array_equal(got.movie_id.values, df.itemId.values)
    np.testing.assert_array_equal(got.rating.values, df.rating.values)
    np.testing.assert_array_equal(
        got.timestamp.values, df.timestamp.values
    )


def test_ml1m_consented_download(tmp_path, monkeypatch):
    """Consenting triggers the (mocked) download into the target path."""
    df = gen_dummy_rating_df(random_seed=5, size=60)
    zippath = tmp_path / "dl.zip"
    monkeypatch.setattr("builtins.input", lambda *_: "y")
    monkeypatch.setattr(
        "urllib.request.urlretrieve",
        lambda url, path: _write_ml1m_zip(path, df),
    )
    man = MovieLens1MDataManager(zippath)
    assert zippath.exists()
    assert man.load_rating_all().shape[0] == len(df)


def test_kfold_split_partitions(tmp_path):
    """K folds partition the data; train+test reconcatenate to the
    full set for every fold (reference test_ml100k.py:8-49 logic)."""
    df = gen_dummy_rating_df(random_seed=7, size=101)
    zippath = tmp_path / "ml-1m.zip"
    _write_ml1m_zip(zippath, df)
    man = MovieLens1MDataManager(zippath)
    full = man.load_rating_all()

    all_tests = []
    for fold in range(7):
        train, test = man.load_rating_kfold_split(7, fold, 42)
        assert train.shape[0] + test.shape[0] == full.shape[0]
        all_tests.append(test)
    recon = pd.concat(all_tests)
    # the test folds form an exact partition of the dataset
    assert recon.shape[0] == full.shape[0]
    key = lambda d: sorted(  # noqa: E731
        zip(d.user_id, d.movie_id, d.rating)
    )
    assert key(recon) == key(full)

    with pytest.raises(ValueError):
        man.load_rating_kfold_split(5, 5, 42)
    with pytest.raises(ValueError):
        train_test_split_with_kfold(full, 5, -1, 0)
