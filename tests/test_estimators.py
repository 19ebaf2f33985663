"""sklearn-compatible estimators (apps/estimators.py)."""

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.apps.estimators import (
    RandomizedPCA,
    RandomizedSVD,
)

sklearn = pytest.importorskip("sklearn")
from sklearn.base import clone  # noqa: E402
from sklearn.decomposition import PCA as SkPCA  # noqa: E402
from sklearn.decomposition import TruncatedSVD  # noqa: E402
from sklearn.pipeline import Pipeline  # noqa: E402
from sklearn.preprocessing import StandardScaler  # noqa: E402


def _data(n=200, f=30, k=6, seed=0, noise=1e-3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, k)) @ rng.standard_normal((k, f))
    return (x + noise * rng.standard_normal((n, f))).astype(np.float64)


class TestRandomizedSVD:
    def test_matches_sklearn_truncated_svd(self):
        x = _data()
        ours = RandomizedSVD(n_components=6, q=2).fit(x)
        ref = TruncatedSVD(n_components=6, algorithm="arpack",
                           random_state=0).fit(x)
        np.testing.assert_allclose(ours.singular_values_,
                                   ref.singular_values_, rtol=1e-6)
        # components match up to per-row sign
        dots = np.abs(np.sum(ours.components_ * ref.components_, axis=1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-6)
        np.testing.assert_allclose(ours.explained_variance_ratio_,
                                   ref.explained_variance_ratio_, atol=1e-6)

    def test_transform_inverse_roundtrip(self):
        x = _data(seed=1)
        est = RandomizedSVD(n_components=6)
        z = est.fit_transform(x)
        assert z.shape == (200, 6)
        xr = est.inverse_transform(est.transform(x))
        assert np.linalg.norm(xr - x) < 1e-2 * np.linalg.norm(x)

    def test_fit_transform_equals_transform(self):
        x = _data(seed=2)
        est = RandomizedSVD(n_components=5)
        z1 = est.fit_transform(x)
        np.testing.assert_allclose(z1, est.transform(x), atol=1e-8)

    def test_sparse_bcoo_input(self):
        from jax.experimental import sparse as jsparse
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        x = rng.standard_normal((100, 40))
        x[np.abs(x) < 1.0] = 0.0
        xb = jsparse.BCOO.fromdense(jnp.asarray(x))
        est = RandomizedSVD(n_components=5, q=2).fit(xb)
        dense = RandomizedSVD(n_components=5, q=2).fit(x)
        np.testing.assert_allclose(est.singular_values_,
                                   dense.singular_values_, rtol=1e-4)
        np.testing.assert_allclose(est.explained_variance_ratio_,
                                   dense.explained_variance_ratio_,
                                   rtol=1e-4)
        z = est.transform(xb)
        assert z.shape == (100, 5)

    def test_clone_and_pipeline(self):
        x = _data(seed=4)
        est = RandomizedSVD(n_components=4, q=1, seed=7)
        c = clone(est)
        assert c.get_params() == est.get_params()
        pipe = Pipeline([("scale", StandardScaler()),
                         ("svd", RandomizedSVD(n_components=4))])
        z = pipe.fit_transform(x)
        assert z.shape == (200, 4)


class TestRandomizedPCA:
    def test_matches_sklearn_pca(self):
        x = _data(seed=5)
        ours = RandomizedPCA(n_components=6).fit(x)
        ref = SkPCA(n_components=6, svd_solver="full").fit(x)
        np.testing.assert_allclose(ours.singular_values_,
                                   ref.singular_values_, rtol=1e-6)
        np.testing.assert_allclose(ours.explained_variance_,
                                   ref.explained_variance_, rtol=1e-6)
        np.testing.assert_allclose(ours.explained_variance_ratio_,
                                   ref.explained_variance_ratio_, atol=1e-6)
        np.testing.assert_allclose(ours.mean_, ref.mean_, atol=1e-10)
        np.testing.assert_allclose(ours.noise_variance_,
                                   ref.noise_variance_, rtol=1e-5,
                                   atol=1e-12)
        dots = np.abs(np.sum(ours.components_ * ref.components_, axis=1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-6)

    def test_transform_matches_sklearn_up_to_sign(self):
        x = _data(seed=6)
        ours = RandomizedPCA(n_components=4).fit(x)
        ref = SkPCA(n_components=4, svd_solver="full").fit(x)
        zo = ours.transform(x)
        zr = ref.transform(x)
        sign = np.sign(np.sum(ours.components_ * ref.components_, axis=1))
        np.testing.assert_allclose(zo, zr * sign[None, :], atol=1e-6)

    def test_inverse_transform_roundtrip_scaled(self):
        x = _data(seed=7)
        est = RandomizedPCA(n_components=8, scale=True)
        z = est.fit_transform(x)
        xr = est.inverse_transform(z)
        assert np.linalg.norm(xr - x) < 5e-2 * np.linalg.norm(x)

    def test_consistent_with_framework_pca(self):
        """Same numbers as the reference-parity PCA class."""
        from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import PCA

        x = _data(seed=8)
        est = RandomizedPCA(n_components=6).fit(x)
        ref = PCA(x, normalize=False)
        np.testing.assert_allclose(
            est.explained_variance_ratio_,
            np.asarray(ref.explained_variance_ratio())[:6], rtol=1e-5)
