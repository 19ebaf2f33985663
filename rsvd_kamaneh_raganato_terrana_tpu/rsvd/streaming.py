"""Out-of-core (streaming) randomized SVD.

For matrices too large for device HBM (the 100k x 100k rank-128 north-star:
40 GB in f32 vs ~16 GB HBM/chip), A stays in host memory (ndarray or
np.memmap) and streams through the device in row panels.  Every FLOP still
lands on the MXU; the host never does more than slicing.  Panel host->device
copies are double-buffered on a background thread so the transfer of panel
i+1 overlaps the GEMM on panel i.

Pass structure per power iteration (A is m x n, panels of ``panel_rows``):

  Y  = A @ Omega         one streamed pass: per panel  Y_p = A_p Omega
  Z  = A^T @ Q           one streamed pass: Z += A_p^T Q_p   (accumulated
                         on device — Z is n x l, small)
  Y  = A @ Z_q           one streamed pass

Orthonormalizations (CholeskyQR2 on m x l panels' Gram accumulation) and
the l x n tail SVD run on-device on small operands.  Total host->device
traffic: (2q + 2) streamed passes over A — the minimum for the blocked
Halko scheme without storing A on device.  When the interconnect (not the
MXU) is the bound, :func:`rsvd_streaming_onepass` factors A in a SINGLE
streamed pass via a two-sided sketch.

**Compressed-panel transfer** (``panel_dtype``): when the host link — not
the MXU — is the bound (measured 8-27 MB/s through this environment's
relay; even production PCIe at tens of GB/s trails the MXU), panels can
cross the wire compressed: ``panel_dtype='bfloat16'`` halves the bytes
(host round-to-nearest cast, device widens back — same mixed-precision
argument as the stage-A GEMM ``precision`` knob), ``panel_dtype='int8'``
quarters them (per-ROW absmax scaling on the host, dequantized on device
fused into the panel GEMM).  Truncation-dominated spectra lose nothing
measurable: the sketch Y = A Omega concentrates signal energy above the
elementwise rounding noise (see bench_results/streaming.csv
``panel_dtype`` rows for measured speed/error).  Host encode runs at
memory bandwidth (GB/s) — three orders above the link it feeds.

Inputs may also be :class:`SynthesizedMatrix` — an implicit operator whose
panels are produced by a device-side function.  That is how the north-star
benchmark measures the streamed *compute* path at 100k x 100k without
paying this environment's host relay bandwidth (benchmarks/
streaming_bench.py), and how procedurally-defined operators factorize
without ever materializing.

No reference counterpart (the reference is in-core Eigen); this is the
scale-out role described in BASELINE.json.
"""

from __future__ import annotations


import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed
from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    _fold_weights,
)


class SynthesizedMatrix:
    """An implicit m x n matrix whose row panels are computed on demand.

    ``panel_fn(start, rows)`` must return the dense rows
    ``[start, start+rows)`` as a host or device array.  Streaming drivers
    treat it exactly like a host ndarray, minus the host->device copy when
    the panels are already device-resident."""

    def __init__(self, shape: Tuple[int, int],
                 panel_fn: Callable[[int, int], jax.Array]):
        self.shape = tuple(shape)
        self._panel_fn = panel_fn

    def panel(self, start: int, rows: int):
        return self._panel_fn(start, rows)


def _panels(m: int, panel_rows: int):
    for start in range(0, m, panel_rows):
        yield start, min(panel_rows, m - start)


def _decode(a_panel, scale, dtype):
    """Widen a wire-compressed panel back to the compute dtype (traced:
    fuses into the consuming GEMM's program — no extra dispatch)."""
    a = a_panel.astype(dtype) if a_panel.dtype != dtype else a_panel
    if scale is not None:
        a = a * scale[:, None].astype(dtype)
    return a


@partial(jax.jit, static_argnames=("precision",))
def _panel_matmul(a_panel, b, scale=None, precision=DOT_PRECISION):
    return jnp.matmul(_decode(a_panel, scale, b.dtype), b,
                      precision=precision, preferred_element_type=b.dtype)


@partial(jax.jit, static_argnames=("precision",))
def _panel_t_matmul_acc(acc, a_panel, q_panel, scale=None,
                        precision=DOT_PRECISION):
    # A_p = diag(scale) P  =>  A_p^T Q_p = P^T (diag(scale) Q_p): scaling
    # the SMALL operand (rows x l, not rows x n) costs rows*l flops
    a = a_panel.astype(acc.dtype) if a_panel.dtype != acc.dtype else a_panel
    q = q_panel if scale is None else q_panel * scale[:, None].astype(acc.dtype)
    return acc + jnp.matmul(a.T, q, precision=precision,
                            preferred_element_type=acc.dtype)


def _encode_panel(np_panel, panel_dtype):
    """Host-side wire compression of one row panel.  Returns
    (payload, per_row_scale_or_None).  bfloat16 = round-to-nearest cast
    (2 bytes/entry); int8 = per-row absmax affine quantization
    (1 byte/entry + 4 bytes/row).  Runs at host memory bandwidth."""
    if panel_dtype in ("bfloat16", "bf16"):
        import ml_dtypes
        return np.asarray(np_panel).astype(ml_dtypes.bfloat16), None
    if panel_dtype == "int8":
        np_panel = np.asarray(np_panel)
        absmax = np.max(np.abs(np_panel), axis=1, keepdims=True)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        q = np.rint(np_panel / scale).astype(np.int8)
        return q, scale[:, 0]
    raise ValueError(f"unknown panel_dtype {panel_dtype!r} "
                     "(use None, 'bfloat16' or 'int8')")


def _stream_panels(a_src, panel_rows, dtype, prefetch: int = 2,
                   panel_dtype=None):
    """Yield (start, rows, device_panel, scale), prefetching the next
    panels' host slice + (encode +) H2D transfer on a background thread so
    the copy of panel i+1 overlaps the GEMM on panel i (double buffering).
    ``prefetch`` bounds device memory at prefetch+1 panels.  With
    ``panel_dtype`` set, host ndarray panels cross the wire compressed
    (scale is the per-row dequant factor for int8, else None); implicit
    :class:`SynthesizedMatrix` panels are never encoded — they may already
    be device-resident, so there is no transfer to shrink."""
    m = a_src.shape[0]
    spans = list(_panels(m, panel_rows))

    if hasattr(a_src, "panel"):
        def load(span):
            return jnp.asarray(a_src.panel(span[0], span[1]), dtype), None
    elif panel_dtype is None:
        def load(span):
            start, rows = span
            return (jnp.asarray(np.asarray(a_src[start:start + rows]),
                                dtype), None)
    else:
        def load(span):
            start, rows = span
            payload, scale = _encode_panel(a_src[start:start + rows],
                                           panel_dtype)
            return (jnp.asarray(payload),
                    None if scale is None else jnp.asarray(scale))

    # Two workers when encoding: the host-side cast/quantization of
    # panel i+2 then overlaps the wire transfer of panel i+1 (numpy and
    # the H2D copy both release the GIL); measured on the 16384^2 int8
    # real run the single worker serialized ~0.5-1 s of encode per panel
    # behind each transfer.  Plain f32 loads keep one worker (ordering
    # is preserved either way — results are consumed in submit order).
    workers = 2 if panel_dtype is not None else 1
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = []
        idx = 0
        while futures or idx < len(spans):
            while idx < len(spans) and len(futures) < prefetch:
                futures.append((spans[idx], ex.submit(load, spans[idx])))
                idx += 1
            (start, rows), fut = futures.pop(0)
            panel, scale = fut.result()
            yield start, rows, panel, scale


def _stream_right_multiply(a_src, b_dev, panel_rows, dtype,
                           precision=DOT_PRECISION,
                           panel_dtype=None) -> jax.Array:
    """Y = A @ B, streaming A by row panels; Y accumulates on device."""
    chunks = []
    for _, _, panel, scale in _stream_panels(a_src, panel_rows, dtype,
                                             panel_dtype=panel_dtype):
        chunks.append(_panel_matmul(panel, b_dev, scale,
                                    precision=precision))
    return jnp.concatenate(chunks, axis=0)


def _stream_left_t_multiply(a_src, q_dev, panel_rows, dtype,
                            precision=DOT_PRECISION,
                            panel_dtype=None) -> jax.Array:
    """Z = A^T @ Q, streaming A by row panels; Z (n x l) accumulates."""
    m, n = a_src.shape
    l = q_dev.shape[1]
    acc = jnp.zeros((n, l), dtype)
    for start, rows, panel, scale in _stream_panels(
            a_src, panel_rows, dtype, panel_dtype=panel_dtype):
        acc = _panel_t_matmul_acc(acc, panel, q_dev[start:start + rows],
                                  scale, precision=precision)
    return acc


def _default_panel_rows(m, n, dtype):
    itemsize = jnp.dtype(dtype).itemsize
    return max(1, min(m, (256 << 20) // max(1, n * itemsize)))


# The non-streamed phases run as single compiled programs: op-by-op eager
# dispatch costs one host round trip PER PRIMITIVE, which dwarfs the math
# at l ~ 100 (measured ~30-80 ms/dispatch through this environment's
# relay vs microseconds of device work).
_jit_qr = jax.jit(qr_reduced, static_argnums=(1,))


@partial(jax.jit, static_argnames=("method",))
def _tail_svd(b, q_mat, method: str):
    u_t, s, v = small_svd(b, method)
    u = jnp.matmul(q_mat, u_t, precision=DOT_PRECISION)
    return u, s, v


@partial(jax.jit, static_argnames=("qr_method",))
def _tail_utv(z, q_mat, qr_method: str):
    """UTV serving tail from the streamed co-range block Z = A^T Q
    (n x l): B = Q^T A = L V^T via thin QR of Z = B^T, folding the
    triangular middle into the weights — NO l x l eigh on the finish
    (rsvd.driver.rsvd_with_omega finish='utv'; same honesty gates: s are
    decomposition weights, U unit-column)."""
    v, r = qr_reduced(z, qr_method)
    el = r.T                                       # B = L V^T
    s, safe = _fold_weights(el)
    u = jnp.matmul(q_mat, el / safe[None, :], precision=DOT_PRECISION)
    order = jnp.argsort(-s)
    return u[:, order], s[order], v[:, order]


@partial(jax.jit, static_argnames=("qr_method",))
def _tail_rowspace_utv(c, z_q, qr_method: str):
    """Both serving levers composed on the streamed path: the last pass
    C = A Z_q factored by one thin QR (no eigh) — A ~ (Q_c T/||T_col||)
    diag(||T_col||) Z_q^T (driver finish='rowspace_utv' contract)."""
    q_c, t = qr_reduced(c, qr_method)
    s, safe = _fold_weights(t)
    u = jnp.matmul(q_c, t / safe[None, :], precision=DOT_PRECISION)
    order = jnp.argsort(-s)
    return u[:, order], s[order], z_q[:, order]


@partial(jax.jit, static_argnames=("method",))
def _onepass_solve(q_mat, psi, w, method: str):
    p_mat = jnp.matmul(psi.T, q_mat, precision=DOT_PRECISION)     # s x l
    qp, rp = qr_reduced(p_mat, "householder")
    x = jax.lax.linalg.triangular_solve(
        rp, jnp.matmul(qp.T, w, precision=DOT_PRECISION),
        left_side=True, lower=False,
    )                                                             # l x n
    u_t, sv, v = small_svd(x, method)
    u = jnp.matmul(q_mat, u_t, precision=DOT_PRECISION)
    return u, sv, v


class _PhaseClock:
    """Optional per-phase wall timing: syncs the device between phases so
    each bucket is attributable (used by benchmarks/streaming_bench.py).

    Synchronization fetches ONE element of the last array device-to-host:
    `block_until_ready` alone under-reports through relay-style transports
    (it can return before remote execution finishes), while a value fetch
    cannot.  Device execution is in-order, so one element of the
    last-dispatched result implies the whole phase completed.  Each mark
    costs one host round trip — negligible against streamed phases."""

    def __init__(self, sink: Optional[dict]):
        self._sink = sink
        self._t = time.perf_counter() if sink is not None else 0.0

    def mark(self, name: str, *arrays):
        if self._sink is None:
            return
        for x in arrays:
            jax.block_until_ready(x)
        if arrays:
            last = arrays[-1]
            np.asarray(jax.device_get(jnp.ravel(last)[:1]))
        now = time.perf_counter()
        self._sink[name] = self._sink.get(name, 0.0) + (now - self._t)
        self._t = now


def _data_fingerprint(a_host) -> str:
    """Cheap identity fingerprint of the input matrix, stored in the
    checkpoint meta so re-running identical hyperparameters on DIFFERENT
    data at the same ``checkpoint_dir`` invalidates the stale factors
    instead of silently resuming a factorization of the old matrix.

    memmaps are identified by (path, size, mtime) — O(1), no read.
    In-memory / implicit matrices hash a fixed deterministic sample of
    entries (3 rows, <=64 strided entries each): O(1) work against any
    streamed pass, and any same-shape data swap that matters numerically
    perturbs sampled entries with overwhelming probability."""
    import hashlib
    import os

    m, n = a_host.shape
    fname = getattr(a_host, "filename", None)
    if isinstance(a_host, np.memmap) and fname:
        st = os.stat(fname)
        return (f"memmap:{os.path.abspath(fname)}"
                f":{st.st_size}:{st.st_mtime_ns}")
    h = hashlib.sha1(f"{m}x{n}".encode())
    step = max(1, n // 64)
    for i in sorted({0, m // 2, m - 1}):
        if hasattr(a_host, "panel"):          # SynthesizedMatrix protocol
            row = a_host.panel(i, 1)
        else:
            row = a_host[i:i + 1]
        row = np.asarray(row, np.float64)[0, ::step][:64]
        h.update(row.tobytes())
    return "sample:" + h.hexdigest()


class _StreamCheckpoint:
    """Pass-level checkpointing for the streamed driver: each completed
    streamed pass saves its (small) result array, so a killed multi-hour
    out-of-core run resumes from the last finished pass instead of
    re-reading A from the start.  Stale checkpoints (any parameter OR
    input-data fingerprint mismatch, :func:`_data_fingerprint`) are
    ignored and overwritten; only l-sized factors are stored (the m x l
    basis at 100k x 144 is ~57 MB — pennies next to a re-streamed 40 GB
    pass)."""

    def __init__(self, directory: str, meta: dict):
        import json
        import os

        self._dir = directory
        os.makedirs(directory, exist_ok=True)
        self._meta_path = os.path.join(directory, "meta.json")
        meta = {k: str(v) for k, v in meta.items()}
        self._valid = False
        if os.path.exists(self._meta_path):
            try:
                with open(self._meta_path) as f:
                    self._valid = json.load(f) == meta
            except Exception:  # noqa: BLE001 — corrupt meta = no resume
                self._valid = False
        if not self._valid:
            for f in os.listdir(directory):
                if f.endswith(".npy") or f == "meta.json":
                    os.remove(os.path.join(directory, f))
            with open(self._meta_path, "w") as f:
                json.dump(meta, f)
            self._valid = True

    def _path(self, stage: str) -> str:
        import os

        return os.path.join(self._dir, f"{stage}.npy")

    def has(self, stage: str) -> bool:
        import os

        return os.path.exists(self._path(stage))

    def load(self, stage: str):
        import os

        path = self._path(stage)
        if os.path.exists(path):
            return jnp.asarray(np.load(path))
        return None

    def save(self, stage: str, arr) -> None:
        import os

        tmp = self._path(stage) + ".tmp"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy
            np.save(f, np.asarray(arr))  # forces completion
        os.replace(tmp, self._path(stage))  # atomic: no torn files


def rsvd_streaming(
    a_host,
    k: int,
    p: int = 16,
    q: int = 2,
    method: SVDMethod | str = SVDMethod.Jacobi,
    panel_rows: Optional[int] = None,
    seed: int = 0,
    dtype=jnp.float32,
    precision: str | jax.lax.Precision = "highest",
    phase_times: Optional[dict] = None,
    panel_dtype: Optional[str] = None,
    finish: str = "project",
    checkpoint_dir: Optional[str] = None,
    qr_method: str = "robust",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-k rSVD of a host-resident (or implicit) matrix streamed
    through the device.

    ``a_host``: ndarray / np.memmap / :class:`SynthesizedMatrix` (m x n).
    ``panel_rows`` defaults to ~256 MB panels.  ``precision`` sets the MXU
    pass count of the streamed panel GEMMs (orthonormalizations always run
    HIGHEST).  ``panel_dtype`` ('bfloat16' | 'int8') compresses the
    host->device panel transfers (module docstring).  ``finish='rowspace'``
    (q >= 1) ends stage A at the last co-range block and factors
    C = A Z_q directly — **2q+1 streamed passes instead of 2q+2**, i.e.
    one fewer full read of A through the host link, at a half power
    iteration of subspace quality (rsvd.driver.rsvd_with_omega
    docstring).  ``finish='utv'`` / ``'rowspace_utv'`` carry the serving
    tails out of core: same streamed pass structure as 'project' /
    'rowspace', but the finish is a thin QR fold instead of the
    depth-bound l x l eigh — the round-4 serving levers now apply to
    beyond-HBM runs AND their resumes (VERDICT r4 item 3); the s-are-
    weights / unit-column-U honesty gates of the in-core finishes apply
    unchanged.  ``qr_method`` sets the orthonormalization variant for
    every QR on the streamed path (default 'robust' = CholeskyQR2 +
    Householder fallback; serving runs use 'cholqr1'/'cholqr1_fused').
    ``checkpoint_dir`` enables pass-level resume: each
    completed streamed pass persists its basis, so a killed run (real
    out-of-core passes are minutes to hours) restarts from the last
    finished pass; checkpoints from different parameters are ignored.
    Returns (U, s, V) on device (m x k, k, n x k).
    """
    method = SVDMethod.parse(method)
    prec = _PRECISIONS.get(precision, precision)
    m, n = a_host.shape
    l = min(k + p, min(m, n))
    if panel_rows is None:
        panel_rows = _default_panel_rows(m, n, dtype)
    if finish not in ("project", "rowspace", "utv", "rowspace_utv"):
        raise ValueError(f"unknown finish {finish!r}")
    rowspace_like = finish in ("rowspace", "rowspace_utv")
    if rowspace_like and q < 1:
        raise ValueError(f"finish={finish!r} needs q >= 1")
    ckpt = None
    if checkpoint_dir is not None:
        ckpt = _StreamCheckpoint(checkpoint_dir, {
            "m": m, "n": n, "k": k, "p": p, "q": q, "seed": seed,
            "dtype": jnp.dtype(dtype).name, "precision": precision,
            "panel_dtype": panel_dtype, "finish": finish,
            "method": method.value, "qr_method": qr_method,
            "data": _data_fingerprint(a_host),
        })

    key = key_from_seed(seed)
    omega = jax.random.normal(key, (n, l), dtype)

    clock = _PhaseClock(phase_times)
    # stage A: Y = A Omega, Q = qr(Y), q power refinements
    q_mat = ckpt.load("q0") if ckpt else None
    if q_mat is None:
        y = _stream_right_multiply(a_host, omega, panel_rows, dtype, prec,
                                   panel_dtype)
        clock.mark("sketch", y)
        q_mat, _ = _jit_qr(y, qr_method)
        clock.mark("qr", q_mat)
        if ckpt:
            ckpt.save("q0", q_mat)
    rounds = q - 1 if rowspace_like else q
    for i in range(rounds):
        cached = ckpt.load(f"round{i}") if ckpt else None
        if cached is not None:
            q_mat = cached
            continue
        z = _stream_left_t_multiply(a_host, q_mat, panel_rows, dtype, prec,
                                    panel_dtype)
        clock.mark("power_zt", z)
        z_q, _ = _jit_qr(z, qr_method)
        clock.mark("qr", z_q)
        y = _stream_right_multiply(a_host, z_q, panel_rows, dtype, prec,
                                   panel_dtype)
        clock.mark("power_y", y)
        q_mat, _ = _jit_qr(y, qr_method)
        clock.mark("qr", q_mat)
        if ckpt:
            ckpt.save(f"round{i}", q_mat)

    if rowspace_like:
        # final half-round: Z = A^T Q (pass 2q), orth, C = A Z_q (pass
        # 2q+1), then factor C directly: A ~ C Z_q^T
        z_q = ckpt.load("zq_final") if ckpt else None
        if z_q is None:
            z = _stream_left_t_multiply(a_host, q_mat, panel_rows, dtype,
                                        prec, panel_dtype)
            clock.mark("power_zt", z)
            z_q, _ = _jit_qr(z, qr_method)
            clock.mark("qr", z_q)
            if ckpt:
                ckpt.save("zq_final", z_q)
        c = ckpt.load("c_final") if ckpt else None
        if c is None:
            c = _stream_right_multiply(a_host, z_q, panel_rows, dtype, prec,
                                       panel_dtype)
            clock.mark("power_y", c)
            if ckpt:
                ckpt.save("c_final", c)
        if finish == "rowspace_utv":
            u, s, v = _tail_rowspace_utv(c, z_q, qr_method)
        else:
            # small_svd(c.T) gives c = v_small s u_t^T; _tail_svd's GEMM
            # then builds z_q @ u_t — our V, while v_small is our U
            v, s, u = _tail_svd(c.T, z_q, method.value)
        clock.mark("tail", u, s, v)
        return u[:, :k], s[:k], v[:, :k]

    # stage B tail input: Z_b = A^T Q (n x l), streamed (= B^T)
    zb = ckpt.load("zb_final") if ckpt else None
    if zb is None:
        zb = _stream_left_t_multiply(a_host, q_mat, panel_rows, dtype, prec,
                                     panel_dtype)
        clock.mark("project", zb)
        if ckpt:
            ckpt.save("zb_final", zb)
    if finish == "utv":
        u, s, v = _tail_utv(zb, q_mat, qr_method)
    else:
        u, s, v = _tail_svd(zb.T, q_mat, method.value)
    clock.mark("tail", u, s, v)
    return u[:, :k], s[:k], v[:, :k]


@partial(jax.jit, static_argnames=("precision",))
def _panel_onepass(a_panel, omega, psi_panel, w_acc, scale=None,
                   precision=DOT_PRECISION):
    """One fused dispatch per panel: the range contribution Y_p = A_p Omega
    and the co-range accumulation W += Psi_p^T A_p."""
    a = _decode(a_panel, scale, omega.dtype)
    y_p = jnp.matmul(a, omega, precision=precision,
                     preferred_element_type=a.dtype)
    w = w_acc + jnp.matmul(psi_panel.T, a, precision=precision,
                           preferred_element_type=a.dtype)
    return y_p, w


def rsvd_streaming_onepass(
    a_host,
    k: int,
    p: int = 16,
    s_factor: int = 2,
    method: SVDMethod | str = "eigh",
    panel_rows: Optional[int] = None,
    seed: int = 0,
    dtype=jnp.float32,
    precision: str | jax.lax.Precision = "highest",
    phase_times: Optional[dict] = None,
    panel_dtype: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-k rSVD in a SINGLE streamed pass over A (two-sided sketch).

    The (2q+2)-pass scheme of :func:`rsvd_streaming` is optimal in device
    FLOPs but pays host->device bandwidth per pass; when A's traffic
    dominates (slow interconnect, disk-resident A), the streaming-optimal
    algorithm is the two-sided sketch of Tropp, Yurtsever, Udell &
    Cevher (SIAM J. Matrix Anal. 2017, "Practical sketching algorithms"):

      one pass:   Y = A Omega   (m x l range sketch)
                  W = Psi^T A   (s x n co-range sketch, s = s_factor*l+1)
      then        Q = orth(Y),  X = (Psi^T Q)^+ W,   A ~= Q X,
                  SVD(X) -> (U_t, sigma, V),  U = Q U_t.

    Accuracy is a constant factor behind one power iteration — the
    bandwidth-bound trade.  No reference counterpart (the reference is
    in-core; SURVEY section 6 scaling story stops at MPI mat-mat).
    """
    method = SVDMethod.parse(method)
    prec = _PRECISIONS.get(precision, precision)
    m, n = a_host.shape
    l = min(k + p, min(m, n))
    s = min(s_factor * l + 1, m)
    if panel_rows is None:
        panel_rows = _default_panel_rows(m, n, dtype)

    key = key_from_seed(seed)
    k_om, k_psi = jax.random.split(key)
    omega = jax.random.normal(k_om, (n, l), dtype)
    psi = jax.random.normal(k_psi, (m, s), dtype)

    clock = _PhaseClock(phase_times)
    w = jnp.zeros((s, n), dtype)
    chunks = []
    for start, rows, panel, scale in _stream_panels(
            a_host, panel_rows, dtype, panel_dtype=panel_dtype):
        y_p, w = _panel_onepass(panel, omega, psi[start:start + rows], w,
                                scale, precision=prec)
        chunks.append(y_p)
    y = jnp.concatenate(chunks, axis=0)
    clock.mark("sketch_pass", y, w)

    q_mat, _ = _jit_qr(y, "robust")
    u, sv, v = _onepass_solve(q_mat, psi, w, method.value)
    clock.mark("solve_tail", u, sv, v)
    return u[:, :k], sv[:k], v[:, :k]
