"""PCA application tests (reference: PCA/tests/pca_test.cpp on tourists.txt
and athletic_test.cpp; oracle = sklearn/np SVD of the centered matrix)."""

import os

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import (
    PCA,
    load_athletic_dataset,
    load_tourists_dataset,
)

from conftest import DATA_DIR


@pytest.fixture(scope="module")
def tourists():
    return load_tourists_dataset(os.path.join(DATA_DIR, "pca", "tourists.txt"))


def test_pca_matches_numpy(tourists):
    data, _ = tourists
    pca = PCA(data, normalize=True)
    xc = (data - data.mean(0)) / data.std(0, ddof=1)
    s_np = np.linalg.svd(xc, compute_uv=False)
    np.testing.assert_allclose(np.asarray(pca.getS()), s_np, rtol=1e-8)
    ratio = np.asarray(pca.explained_variance_ratio())
    np.testing.assert_allclose(ratio.sum(), 1.0, rtol=1e-12)
    assert pca.check_orthogonality() < 1e-9


def test_scores_loadings_project_reconstruct(tourists, rng):
    data, _ = tourists
    pca = PCA(data, normalize=False)
    scores = np.asarray(pca.scores())
    # scores = centered data projected onto loadings
    xc = data - data.mean(0)
    np.testing.assert_allclose(scores, xc @ np.asarray(pca.loadings()),
                               atol=1e-6 * np.abs(scores).max())
    # full-rank project->reconstruct is identity
    proj = pca.project(data)
    back = np.asarray(pca.reconstruct(proj))
    np.testing.assert_allclose(back, data, rtol=1e-8, atol=1e-6)


def test_variance_definition(tourists):
    data, _ = tourists
    pca = PCA(data)
    n = data.shape[0]
    np.testing.assert_allclose(
        np.asarray(pca.explained_variance()),
        np.asarray(pca.getS()) / np.sqrt(n - 1), rtol=1e-12,
    )


def test_summary_and_save(tourists, tmp_path):
    data, _ = tourists
    pca = PCA(data, normalize=True)
    text = pca.summary(feature_names=[f"f{i}" for i in range(data.shape[1])])
    assert "Importance of components" in text
    assert "PC1" in text and "Cumulative Proportion" in text
    out = tmp_path / "res.txt"
    pca.save_results(str(out))
    assert out.exists() and "cumulative" in out.read_text()


def test_add_data(rng):
    a = rng.standard_normal((20, 5))
    pca = PCA(a)
    more = rng.standard_normal((10, 5))
    pca.add_data(more)
    full = np.vstack([a, more])
    s_np = np.linalg.svd(full - full.mean(0), compute_uv=False)
    np.testing.assert_allclose(np.asarray(pca.getS()), s_np, rtol=1e-8)


def test_athletic_dataset():
    data, countries = load_athletic_dataset(
        os.path.join(DATA_DIR, "pca", "dataset_athletic.txt")
    )
    pca = PCA(data, normalize=True)
    ratio = np.asarray(pca.explained_variance_ratio())
    # running-event times are highly correlated: PC1 dominates
    assert ratio[0] > 0.5


def test_rsvd_fast_path(rng):
    x = rng.standard_normal((200, 30))
    exact = PCA(x)
    fast = PCA(x, use_rsvd=True, rank=10, method="jacobi")
    # flat Gaussian spectrum: randomized path accurate to ~1% (tight
    # agreement needs spectral decay, tested in test_rsvd.py)
    np.testing.assert_allclose(
        np.asarray(fast.getS())[:5], np.asarray(exact.getS())[:5], rtol=2e-2
    )


def test_validation():
    with pytest.raises(ValueError):
        PCA(np.ones((1, 5)))
