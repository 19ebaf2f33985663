"""Out-of-core (streaming) randomized SVD.

For matrices too large for device HBM (the 100k x 100k rank-128 north-star:
40 GB in f32 vs ~16 GB HBM/chip), A stays in host memory (ndarray or
np.memmap) and streams through the device in row panels.  Every FLOP still
lands on the MXU; the host never does more than slicing.

Pass structure per power iteration (A is m x n, panels of ``panel_rows``):

  Y  = A @ Omega         one streamed pass: per panel  Y_p = A_p Omega
  Z  = A^T @ Q           one streamed pass: Z += A_p^T Q_p   (accumulated
                         on device — Z is n x l, small)
  Y  = A @ Z_q           one streamed pass

Orthonormalizations (CholeskyQR2 on m x l panels' Gram accumulation) and
the l x n tail SVD run on-device on small operands.  Total host->device
traffic: (2q + 2) streamed passes over A — the minimum for the blocked
Halko scheme without storing A on device.

The Q factor of the tall m x l Y is needed for B = Q^T A and U = Q U_t;
both are computed panel-streamed as well, so no m x l array ever exceeds
one panel on device except Y/Q themselves (m x l, small for l << n).

No reference counterpart (the reference is in-core Eigen); this is the
scale-out role described in BASELINE.json.
"""

from __future__ import annotations


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed
from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


def _panels(m: int, panel_rows: int):
    for start in range(0, m, panel_rows):
        yield start, min(panel_rows, m - start)


@jax.jit
def _panel_matmul(a_panel, b):
    return jnp.matmul(a_panel, b, precision=DOT_PRECISION,
                      preferred_element_type=a_panel.dtype)


@jax.jit
def _panel_t_matmul_acc(acc, a_panel, q_panel):
    return acc + jnp.matmul(a_panel.T, q_panel, precision=DOT_PRECISION,
                            preferred_element_type=a_panel.dtype)


def _stream_right_multiply(a_host, b_dev, panel_rows, dtype) -> jax.Array:
    """Y = A @ B, streaming A by row panels; Y accumulates on device."""
    m = a_host.shape[0]
    chunks = []
    for start, rows in _panels(m, panel_rows):
        panel = jnp.asarray(np.asarray(a_host[start:start + rows]), dtype)
        chunks.append(_panel_matmul(panel, b_dev))
    return jnp.concatenate(chunks, axis=0)


def _stream_left_t_multiply(a_host, q_dev, panel_rows, dtype) -> jax.Array:
    """Z = A^T @ Q, streaming A by row panels; Z (n x l) accumulates."""
    m, n = a_host.shape
    l = q_dev.shape[1]
    acc = jnp.zeros((n, l), dtype)
    for start, rows in _panels(m, panel_rows):
        panel = jnp.asarray(np.asarray(a_host[start:start + rows]), dtype)
        acc = _panel_t_matmul_acc(acc, panel, q_dev[start:start + rows])
    return acc


def rsvd_streaming(
    a_host,
    k: int,
    p: int = 16,
    q: int = 2,
    method: SVDMethod | str = SVDMethod.Jacobi,
    panel_rows: Optional[int] = None,
    seed: int = 0,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-k rSVD of a host-resident matrix streamed through the device.

    ``a_host``: ndarray / np.memmap (m x n).  ``panel_rows`` defaults to
    ~256 MB panels.  Returns (U, s, V) on device (m x k, k, n x k).
    """
    method = SVDMethod.parse(method)
    m, n = a_host.shape
    l = min(k + p, min(m, n))
    itemsize = jnp.dtype(dtype).itemsize
    if panel_rows is None:
        panel_rows = max(1, min(m, (256 << 20) // max(1, n * itemsize)))

    key = key_from_seed(seed)
    omega = jax.random.normal(key, (n, l), dtype)

    # stage A: Y = A Omega, Q = qr(Y), q power refinements
    y = _stream_right_multiply(a_host, omega, panel_rows, dtype)
    q_mat, _ = qr_reduced(y, "robust")
    for _ in range(q):
        z = _stream_left_t_multiply(a_host, q_mat, panel_rows, dtype)
        z_q, _ = qr_reduced(z, "robust")
        y = _stream_right_multiply(a_host, z_q, panel_rows, dtype)
        q_mat, _ = qr_reduced(y, "robust")

    # stage B: B = Q^T A  (l x n), streamed:  B = (A^T Q)^T
    b = _stream_left_t_multiply(a_host, q_mat, panel_rows, dtype).T
    u_t, s, v = small_svd(b, method)
    u = jnp.matmul(q_mat, u_t, precision=DOT_PRECISION)
    return u[:, :k], s[:k], v[:, :k]
