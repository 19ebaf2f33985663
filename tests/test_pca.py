"""PCA application tests (reference: PCA/tests/pca_test.cpp on tourists.txt
and athletic_test.cpp; oracle = sklearn/np SVD of the centered matrix)."""

import os

import jax.numpy as jnp
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


class TestStreamingPCA:
    def test_matches_batch_pca_on_low_rank_stream(self):
        from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import StreamingPCA

        rng = np.random.default_rng(30)
        d, n, r = 20, 600, 4
        basis = np.linalg.qr(rng.standard_normal((d, r)))[0]
        a = (rng.standard_normal((n, r)) * [3.0, 2.0, 1.5, 1.0]) @ basis.T
        a = a + rng.uniform(-1, 1, d)[None, :]      # nonzero mean
        sp = StreamingPCA(d, l=12, dtype=jnp.float64)
        for i in range(0, n, 37):                    # ragged batches
            sp.update(a[i:i + 37])
        assert sp.n_seen == n
        lam, v = sp.finalize(k=r)
        xc = a - a.mean(axis=0)
        w_true, v_true = np.linalg.eigh(xc.T @ xc / (n - 1))
        w_true, v_true = w_true[::-1][:r], v_true[:, ::-1][:, :r]
        np.testing.assert_allclose(lam, w_true, rtol=1e-6)
        overlap = np.abs(np.einsum("ij,ij->j", v, v_true))
        assert overlap.min() > 1 - 1e-8
        # stream mean matches the batch mean
        np.testing.assert_allclose(sp.mean, a.mean(axis=0), rtol=1e-12)

    def test_eigenvalues_never_overestimate(self):
        from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import StreamingPCA

        rng = np.random.default_rng(31)
        a = rng.standard_normal((400, 16))          # full-rank noise
        sp = StreamingPCA(16, l=8, dtype=jnp.float64)
        sp.update(a)
        lam, _ = sp.finalize(k=5)
        xc = a - a.mean(axis=0)
        w_true = np.linalg.eigvalsh(xc.T @ xc / 399)[::-1][:5]
        assert np.all(lam <= w_true + 1e-9)

    def test_project_centers_with_stream_mean(self):
        from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import StreamingPCA

        rng = np.random.default_rng(32)
        a = rng.standard_normal((100, 6)) + 5.0
        sp = StreamingPCA(6, l=6, dtype=jnp.float64).update(a)
        z = sp.project(a[:3], k=2)
        assert z.shape == (3, 2)
        assert np.all(np.isfinite(z))
