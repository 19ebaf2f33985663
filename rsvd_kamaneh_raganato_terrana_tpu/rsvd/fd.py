"""Frequent Directions: deterministic single-pass row-stream sketching.

Beyond-parity extension.  The framework's other out-of-core paths
(rsvd/streaming.py) need a REWINDABLE source — memmap panels that can be
read again per power iteration (or once, for the two-sided sketch).
Frequent Directions (Liberty 2013; Ghashami, Liberty, Phillips & Woodruff
2016) covers the remaining case: rows arrive once, in order, unbounded —
online covariance/PCA over a stream — with a deterministic guarantee

    0  <=  ||A^T A - S^T S||_2  <=  ||A - A_k||_F^2 / (l - k)

for the l x n sketch S, no randomness involved.

TPU shape: the sketch buffer is a fixed 2l x n array living on device;
each `update(rows)` appends a row batch and, when the buffer fills,
SHRINKS it with one jitted step: Gram (2l x 2l, HIGHEST) -> eigh ->
subtract the (l+1)-th eigenvalue from the top spectrum -> rebuild l
sketch rows as scaled right singular vectors.  Everything is GEMM +
replicated small-eigh — the same MXU/latency profile as the rSVD tail;
no per-row Python work, batches of any size stream through.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm


@partial(jax.jit, static_argnames=("l",))
def _shrink(buf, l: int):
    """One FD shrink step on a full 2l x n buffer: return a buffer whose
    first l rows are the shrunken sketch and whose last l rows are zero.

    Uses the Gram route (eigh of buf buf^T, 2l x 2l) instead of an SVD of
    the 2l x n buffer: n can be large, the Gram is tiny and replicated."""
    g = _mm(buf, buf.T, jax.lax.Precision.HIGHEST)
    g = 0.5 * (g + g.T)
    w, q = jnp.linalg.eigh(g)                 # ascending
    w = jnp.maximum(w[::-1], 0.0)             # descending sigma^2
    q = q[:, ::-1]
    delta = w[l]                              # (l+1)-th squared value
    shrunk = jnp.sqrt(jnp.maximum(w - delta, 0.0))      # top 2l, zeros past l
    # sketch rows: diag(shrunk) V^T = diag(shrunk / sigma) Q^T buf
    sigma = jnp.sqrt(jnp.maximum(w, 0.0))
    scale = jnp.where(sigma > 0, shrunk / jnp.maximum(sigma, 1e-30), 0.0)
    return _mm((q * scale[None, :]).T, buf, jax.lax.Precision.HIGHEST)


class FrequentDirections:
    """Streaming l x n sketch with the FD guarantee (see module docstring).

    >>> fd = FrequentDirections(n_cols=..., l=64)
    >>> for batch in row_batches:      # each batch: (b, n), any b
    ...     fd.update(batch)
    >>> s_rows = fd.sketch()           # l x n, ||A^T A - S^T S|| bounded
    >>> w, v = fd.eigh_estimate(k=16)  # top right-singular estimates

    The buffer holds 2l rows; updates copy batches in host-side and
    dispatch one jitted shrink per fill — O(l n) device memory total,
    independent of the stream length.
    """

    def __init__(self, n_cols: int, l: int, dtype=jnp.float32):
        if l < 1:
            raise ValueError("l must be >= 1")
        self.n = int(n_cols)
        self.l = int(l)
        self._buf = jnp.zeros((2 * self.l, self.n), dtype=dtype)
        self.dtype = self._buf.dtype
        self._fill = 0           # next free buffer row
        self._seen = 0

    def update(self, rows) -> "FrequentDirections":
        """Absorb a batch of rows (b x n, any b)."""
        rows = np.asarray(rows, dtype=self.dtype)
        if rows.ndim == 1:
            rows = rows[None, :]
        if rows.shape[1] != self.n:
            raise ValueError(f"expected {self.n} columns, got {rows.shape}")
        self._seen += rows.shape[0]
        pos = 0
        while pos < rows.shape[0]:
            space = 2 * self.l - self._fill
            take = min(space, rows.shape[0] - pos)
            chunk = jnp.asarray(rows[pos:pos + take], dtype=self.dtype)
            self._buf = jax.lax.dynamic_update_slice(
                self._buf, chunk, (self._fill, 0))
            self._fill += take
            pos += take
            if self._fill == 2 * self.l:
                self._buf = _shrink(self._buf, self.l)
                self._fill = self.l
        return self

    def sketch(self) -> jax.Array:
        """The current sketch: up to 2l rows S with
        ||A^T A - S^T S||_2 <= ||A - A_k||_F^2 / (l - k)."""
        return self._buf[: self._fill]

    def eigh_estimate(self, k: Optional[int] = None
                      ) -> Tuple[jax.Array, jax.Array]:
        """Top-k estimated eigenpairs of A^T A from the sketch:
        (lam: k, V: n x k) with lam descending.  FD's deterministic bound
        makes lam an UNDER-estimate within ||A - A_k||_F^2 / (l - k)."""
        s = self.sketch()
        g = _mm(s, s.T, jax.lax.Precision.HIGHEST)
        g = 0.5 * (g + g.T)
        w, q = jnp.linalg.eigh(g)
        w = jnp.maximum(w[::-1], 0.0)
        q = q[:, ::-1]
        kk = min(k or self.l, s.shape[0])
        sigma = jnp.sqrt(jnp.maximum(w[:kk], 1e-30))
        v = _mm(s.T, q[:, :kk] / sigma[None, :], jax.lax.Precision.HIGHEST)
        return w[:kk], v

    @property
    def rows_seen(self) -> int:
        return self._seen
