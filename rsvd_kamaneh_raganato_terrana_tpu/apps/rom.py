"""Galerkin reduced-order model + POD pipeline drivers.

TPU counterpart of the reference's AdvDiffPOD class and Diff1D driver
family (POD/ParametricDiffusion1D/src/AdvDiff1D_POD.{hpp,cpp},
Diff1D.cpp, Diff1D_new_prm.cpp, Diff1D_convergence.cpp, Diff1D_openmp.cpp).

The ROM: with mode matrix T (Nh x r),
  lhs_r = T^T lhs T            (projected once — reference project_lhs,
                                AdvDiff1D_POD.cpp:438-537, which looped
                                column-by-column because PETSc mmult was
                                protected; here it is two GEMMs),
  per step: FOM-space rhs from the previous *expanded* solution
            (reference uses fom_solution in assemble_rhs, :331),
            rhs_r = T^T rhs  ->  r x r dense solve  ->  expand u = T u_r.
The r x r system is solved directly via LU (the reference ran dense GMRES
with an identity preconditioner, :647-656 — at r <= 20 a direct solve is
both faster and exact).  The reduced system is replicated, matching the
reference's replicated design note (:94-97).

Drivers:
- ``run_pod_pipeline``      — Diff1D.cpp: FOM sweep -> POD -> ROM loop ->
                              error table + full/reconstruction/errors/sigma
                              exports.
- ``run_new_param_study``   — Diff1D_new_prm.cpp: ROM prediction at an
                              unseen mu with FOM ground truth + timings.
- ``run_convergence_study`` — Diff1D_convergence.cpp: FOM/ROM L2/H1 errors
                              vs deltat with convergence orders.

The FOM parameter sweep is vmapped (the reference's OpenMP sweep,
Diff1D_openmp.cpp:125-137, without its snapshot-matrix race).
"""

from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass, replace
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff
from rsvd_kamaneh_raganato_terrana_tpu.apps.advdiff import (
    AdvDiffConfig,
    FOMResult,
    build_operators,
    error_norms,
    initial_condition,
    solve_fom,
    solve_fom_sweep,
)
from rsvd_kamaneh_raganato_terrana_tpu.apps.pod import POD, make_pod
from rsvd_kamaneh_raganato_terrana_tpu.core.config import PodConfig
from rsvd_kamaneh_raganato_terrana_tpu.core.io import write_matrix_market
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def solve_rom(cfg: AdvDiffConfig, mu, modes, dtype=None) -> jax.Array:
    """Run the reduced time loop; returns the final-time expanded solution
    (reference solve_reduced, AdvDiff1D_POD.cpp:681-771).  Jitted with the
    config static: one compile per (config, rom-size) pair, then each
    parameter evaluation is a single device program."""
    if dtype is None:
        dtype = advdiff.default_fem_dtype()
    mu = jnp.asarray(mu, dtype)
    t = jnp.asarray(modes, dtype)          # Nh x r
    ops = build_operators(cfg, mu, dtype)
    # NaN guard on modes (reference convert_modes, :358-392)
    t = jnp.nan_to_num(t)
    lhs_r = jnp.matmul(t.T, jnp.matmul(ops.lhs, t, precision=DOT_PRECISION),
                       precision=DOT_PRECISION)
    lu_r = jax.scipy.linalg.lu_factor(lhs_r)
    dt_step = cfg.deltat

    u0 = initial_condition(ops.nodes, cfg.u0_choice, cfg.amplitude).astype(dtype)
    u0 = u0.at[0].set(0.0).at[-1].set(0.0)
    # IC projection: least-squares r0 = (T^T T)^{-1} T^T u0.  The reference
    # uses plain T^T u0 (project_u0, :396-434), which is only correct for
    # I-orthonormal modes; energy/weight POD modes are X_h-orthonormal with
    # column norms up to 1/sqrt(lambda_min(X_h)), and the plain projection
    # inflates the IC by that factor squared (documented deviation,
    # docs/PARITY.md).  For standard/naive POD the two coincide.
    gram_t = jnp.matmul(t.T, t, precision=DOT_PRECISION)
    r0 = jnp.linalg.solve(gram_t, jnp.matmul(t.T, u0, precision=DOT_PRECISION))
    u_fom = jnp.matmul(t, r0, precision=DOT_PRECISION)

    # Precompute every step's theta-weighted load vector in one vmap
    # (forcing is known a priori; see solve_fom).
    times = jnp.arange(cfg.n_steps + 1, dtype=dtype) * dt_step
    f_all = jax.vmap(
        lambda tt: advdiff.load_vector(tt, mu, cfg, ops.nodes, dtype)
    )(times)
    f_theta = cfg.theta * f_all[1:] + (1.0 - cfg.theta) * f_all[:-1]
    f_theta = f_theta.at[:, 0].set(0.0).at[:, -1].set(0.0)

    def step(u_f, f_t):
        rhs = (ops.rhs_mat @ u_f + f_t).at[0].set(0.0).at[-1].set(0.0)
        rhs_r = jnp.matmul(t.T, rhs, precision=DOT_PRECISION)
        u_r = jax.scipy.linalg.lu_solve(lu_r, rhs_r)
        u_next = jnp.matmul(t, u_r, precision=DOT_PRECISION)
        return u_next, None

    u_final, _ = jax.lax.scan(step, u_fom, f_theta)
    return u_final


@partial(jax.jit, static_argnames=("cfg", "kind", "dtype"))
def solve_rom_reaction_full(cfg: AdvDiffConfig, mu, modes, c_react,
                            kind: str = "cubic", dtype=None) -> jax.Array:
    """Galerkin ROM for the advection-diffusion-REACTION FOM
    (advdiff.solve_fom_reaction) with the nonlinearity evaluated in FULL
    order each step — the accuracy yardstick for ``solve_rom_deim`` (and
    the O(Nh) per-step cost DEIM exists to remove)."""
    if dtype is None:
        dtype = advdiff.default_fem_dtype()
    mu = jnp.asarray(mu, dtype)
    c_react = jnp.asarray(c_react, dtype)
    t = jnp.nan_to_num(jnp.asarray(modes, dtype))
    ops = build_operators(cfg, mu, dtype)
    n = cfg.n_nodes
    mass_d = advdiff.mass_matrix(n, dtype).at[0].set(0.0).at[-1].set(0.0)
    lhs_r = jnp.matmul(t.T, jnp.matmul(ops.lhs, t, precision=DOT_PRECISION),
                       precision=DOT_PRECISION)
    lu_r = jax.scipy.linalg.lu_factor(lhs_r)

    u0 = initial_condition(ops.nodes, cfg.u0_choice, cfg.amplitude).astype(dtype)
    u0 = u0.at[0].set(0.0).at[-1].set(0.0)
    gram_t = jnp.matmul(t.T, t, precision=DOT_PRECISION)
    r0 = jnp.linalg.solve(gram_t, jnp.matmul(t.T, u0, precision=DOT_PRECISION))
    u_f0 = jnp.matmul(t, r0, precision=DOT_PRECISION)

    times = jnp.arange(cfg.n_steps + 1, dtype=dtype) * cfg.deltat
    f_all = jax.vmap(
        lambda tt: advdiff.load_vector(tt, mu, cfg, ops.nodes, dtype)
    )(times)
    f_theta = cfg.theta * f_all[1:] + (1.0 - cfg.theta) * f_all[:-1]
    f_theta = f_theta.at[:, 0].set(0.0).at[:, -1].set(0.0)

    def step(u_f, f_t):
        g = advdiff.reaction(u_f, kind, c_react)
        rhs = (ops.rhs_mat @ u_f + f_t - mass_d @ g)
        rhs = rhs.at[0].set(0.0).at[-1].set(0.0)
        rhs_r = jnp.matmul(t.T, rhs, precision=DOT_PRECISION)
        u_r = jax.scipy.linalg.lu_solve(lu_r, rhs_r)
        return jnp.matmul(t, u_r, precision=DOT_PRECISION), None

    u_final, _ = jax.lax.scan(step, u_f0, f_theta)
    return u_final


@partial(jax.jit, static_argnames=("cfg", "kind", "dtype"))
def solve_rom_deim(cfg: AdvDiffConfig, mu, modes, deim, c_react,
                   kind: str = "cubic", dtype=None) -> jax.Array:
    """POD-DEIM ROM: fully reduced online stage.  ``deim`` is an
    ``rsvd.deim.Deim`` fitted on nonlinearity snapshots (g applied to the
    FOM snapshot matrix — g is nodewise, so g-snapshots are free).

    Offline (here, once per (mu, rom size)): project the linear operators
    to r x r, the forcing to steps x r, and precompute
      E = T^T M_d proj   (r x m)   and   S = T[idx, :]   (m x r),
    so each online step is O(r^2 + r m):
      rhs_r = R_lin u_r + f_r - E g(S u_r).
    Because g is memoryless/nodewise, g(u)[idx] == g(u[idx]) — the DEIM
    point evaluations need only the m sampled entries S u_r, never the
    expanded state.  Equivalent to ``solve_rom_reaction_full`` up to the
    DEIM interpolation error (the step recursion is algebraically
    identical when the nonlinearity lies in span(deim.basis)).
    Returns the final-time solution expanded to FOM space."""
    if dtype is None:
        dtype = advdiff.default_fem_dtype()
    mu = jnp.asarray(mu, dtype)
    c_react = jnp.asarray(c_react, dtype)
    t = jnp.nan_to_num(jnp.asarray(modes, dtype))
    ops = build_operators(cfg, mu, dtype)
    n = cfg.n_nodes
    mass_d = advdiff.mass_matrix(n, dtype).at[0].set(0.0).at[-1].set(0.0)

    lhs_r = jnp.matmul(t.T, jnp.matmul(ops.lhs, t, precision=DOT_PRECISION),
                       precision=DOT_PRECISION)
    lu_r = jax.scipy.linalg.lu_factor(lhs_r)
    r_lin = jnp.matmul(t.T, jnp.matmul(ops.rhs_mat, t,
                                       precision=DOT_PRECISION),
                       precision=DOT_PRECISION)
    proj = jnp.asarray(deim.proj, dtype)
    e_mat = jnp.matmul(t.T, jnp.matmul(mass_d, proj,
                                       precision=DOT_PRECISION),
                       precision=DOT_PRECISION)          # r x m
    s_mat = jnp.take(t, deim.indices, axis=0)            # m x r

    u0 = initial_condition(ops.nodes, cfg.u0_choice, cfg.amplitude).astype(dtype)
    u0 = u0.at[0].set(0.0).at[-1].set(0.0)
    gram_t = jnp.matmul(t.T, t, precision=DOT_PRECISION)
    r0 = jnp.linalg.solve(gram_t, jnp.matmul(t.T, u0, precision=DOT_PRECISION))

    times = jnp.arange(cfg.n_steps + 1, dtype=dtype) * cfg.deltat
    f_all = jax.vmap(
        lambda tt: advdiff.load_vector(tt, mu, cfg, ops.nodes, dtype)
    )(times)
    f_theta = cfg.theta * f_all[1:] + (1.0 - cfg.theta) * f_all[:-1]
    f_theta = f_theta.at[:, 0].set(0.0).at[:, -1].set(0.0)
    f_r = jnp.matmul(f_theta, t, precision=DOT_PRECISION)  # steps x r

    def step(u_r, f_t_r):
        g_pts = advdiff.reaction(s_mat @ u_r, kind, c_react)   # m values
        rhs_r = r_lin @ u_r + f_t_r - e_mat @ g_pts
        return jax.scipy.linalg.lu_solve(lu_r, rhs_r), None

    u_r_final, _ = jax.lax.scan(step, r0, f_r)
    return jnp.matmul(t, u_r_final, precision=DOT_PRECISION)


def relative_l2_error(u_fom, u_rom) -> float:
    """||u_fom - u_rom|| / ||u_fom|| (reference Diff1D.cpp:264-266)."""
    return float(jnp.linalg.norm(u_fom - u_rom) / jnp.linalg.norm(u_fom))


@dataclass
class PipelineResult:
    mus: np.ndarray
    snapshots: np.ndarray            # Nh x (n * n_saved)
    pod: POD
    errors: Dict[int, List[float]]   # rom_size -> per-mu final rel-L2 error
    timings: Dict[str, float]


def run_pod_pipeline(
    pod_cfg: PodConfig,
    adv_cfg: AdvDiffConfig,
    out_dir: Optional[str] = None,
    dtype=None,
) -> PipelineResult:
    """The Diff1D.cpp main workflow (POD/.../Diff1D.cpp:18-301)."""
    if dtype is None:
        dtype = advdiff.default_fem_dtype()
    timings: Dict[str, float] = {}
    mus = np.linspace(pod_cfg.mu_min, pod_cfg.mu_max, pod_cfg.n)

    t0 = time.perf_counter()
    sweep = solve_fom_sweep(adv_cfg, mus, dtype)
    snaps = jax.block_until_ready(
        jnp.moveaxis(sweep.snapshots, 0, 1).reshape(
            sweep.snapshots.shape[1], -1
        )
    )
    timings["snapshot_ms"] = 1e3 * (time.perf_counter() - t0)

    t0 = time.perf_counter()
    pod = make_pod(pod_cfg.pod_type, snaps, pod_cfg.rank, pod_cfg.tol,
                   pod_cfg.svd_type)
    jax.block_until_ready(pod.modes)
    timings["pod_ms"] = 1e3 * (time.perf_counter() - t0)

    errors: Dict[int, List[float]] = {}
    t0 = time.perf_counter()
    fom_finals = sweep.solution  # (n, Nh)
    for rom_size in pod_cfg.rom_sizes:
        rs = min(rom_size, pod.modes.shape[1])
        modes = pod.modes[:, :rs]
        rom_finals = jax.vmap(
            lambda m: solve_rom(adv_cfg, m, modes, dtype)
        )(jnp.asarray(mus, dtype))
        errors[rom_size] = [
            relative_l2_error(fom_finals[i], rom_finals[i])
            for i in range(len(mus))
        ]
    timings["rom_ms"] = 1e3 * (time.perf_counter() - t0)

    result = PipelineResult(mus, np.asarray(snaps), pod, errors, timings)
    if out_dir:
        _export_pipeline(result, pod_cfg, adv_cfg, out_dir)
    return result


def _export_pipeline(res: PipelineResult, pod_cfg: PodConfig,
                     adv_cfg: AdvDiffConfig, out_dir: str) -> None:
    """full.mtx / reconstruction.mtx / errors.mtx / sigma.txt exports
    (reference Diff1D.cpp:284-298)."""
    os.makedirs(out_dir, exist_ok=True)
    write_matrix_market(os.path.join(out_dir, "full.mtx"), res.snapshots)
    w = np.asarray(res.pod.W)
    recon = w @ (w.T @ res.snapshots)
    write_matrix_market(os.path.join(out_dir, "reconstruction.mtx"), recon)
    err_mat = np.asarray(
        [[res.errors[rs][i] for i in range(len(res.mus))]
         for rs in pod_cfg.rom_sizes]
    )
    write_matrix_market(os.path.join(out_dir, "errors.mtx"), err_mat)
    with open(os.path.join(out_dir, "sigma.txt"), "w") as f:
        for s in np.asarray(res.pod.sigma):
            f.write(f"{s:.18e}\n")


def run_new_param_study(
    pod_cfg: PodConfig,
    adv_cfg: AdvDiffConfig,
    out_csv: Optional[str] = None,
    dtype=None,
) -> List[dict]:
    """Diff1D_new_prm.cpp workflow: train on n seen parameters, predict at
    the unseen mu_new, report per-rom-size error + FOM/ROM timings
    (the schema of results/test02/time_*.csv)."""
    assert pod_cfg.mu_new is not None, "mu_new required for this study"
    mus = np.linspace(pod_cfg.mu_min, pod_cfg.mu_max, pod_cfg.n)

    t0 = time.perf_counter()
    snaps = advdiff.snapshot_matrix(adv_cfg, mus, dtype)
    jax.block_until_ready(snaps)
    snapshot_ms = 1e3 * (time.perf_counter() - t0)

    pod = make_pod(pod_cfg.pod_type, snaps, pod_cfg.rank, pod_cfg.tol,
                   pod_cfg.svd_type)

    t0 = time.perf_counter()
    fom_new = jax.block_until_ready(
        solve_fom(adv_cfg, pod_cfg.mu_new, dtype).solution
    )
    fom_ms = 1e3 * (time.perf_counter() - t0)
    n_steps = adv_cfg.n_steps

    rows = []
    for rom_size in pod_cfg.rom_sizes:
        rs = min(rom_size, pod.modes.shape[1])
        modes = pod.modes[:, :rs]
        t0 = time.perf_counter()
        rom_final = jax.block_until_ready(
            solve_rom(adv_cfg, pod_cfg.mu_new, modes, dtype)
        )
        rom_ms = 1e3 * (time.perf_counter() - t0)
        rows.append({
            "rom_size": rom_size,
            "seq_snapshots_ms": round(snapshot_ms, 3),
            "total_fom_ms": round(fom_ms, 3),
            "total_rom_ms": round(rom_ms, 3),
            "step_avg_fom_us": round(1e3 * fom_ms / n_steps, 3),
            "step_avg_rom_us": round(1e3 * rom_ms / n_steps, 3),
            "err": relative_l2_error(fom_new, rom_final),
        })
    if out_csv:
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows


def convergence_order(errors: Sequence[float], dts: Sequence[float]) -> List[float]:
    """log-ratio convergence orders (reference Diff1D_convergence.cpp:18-80)."""
    out = []
    for i in range(1, len(errors)):
        out.append(
            float(np.log(errors[i] / errors[i - 1])
                  / np.log(dts[i] / dts[i - 1]))
        )
    return out


def run_convergence_study(
    adv_cfg: AdvDiffConfig,
    deltats: Sequence[float],
    mu: float = 0.01,
    rom_modes: Optional[np.ndarray] = None,
    out_csv: Optional[str] = None,
    dtype=None,
) -> dict:
    """Temporal convergence of the FOM (and optionally the ROM) vs the
    exact manufactured solution (Diff1D_convergence.cpp)."""
    if adv_cfg.u0_choice == 0 and adv_cfg.amplitude != 1.0:
        import warnings

        warnings.warn(
            "u0_choice=0 with amplitude != 1: the reference forcing omits "
            "the amplitude factor (AdvDiff1D.hpp:126-133), so the exact-"
            "solution error has an O(1) model-inconsistency floor and no "
            "temporal order will be observable; use amplitude=1.",
            stacklevel=2,
        )
    l2s, h1s, rom_l2s = [], [], []
    for dt_val in deltats:
        cfg = replace(adv_cfg, deltat=dt_val)
        res = solve_fom(cfg, mu, dtype)
        l2, h1 = error_norms(res.solution, cfg.n_steps * dt_val, cfg)
        l2s.append(float(l2))
        h1s.append(float(h1))
        if rom_modes is not None:
            u_rom = solve_rom(cfg, mu, rom_modes, dtype)
            l2r, _ = error_norms(u_rom, cfg.n_steps * dt_val, cfg)
            rom_l2s.append(float(l2r))
    out = {
        "deltat": list(deltats),
        "fom_l2": l2s,
        "fom_h1": h1s,
        "fom_order": convergence_order(l2s, deltats),
    }
    if rom_modes is not None:
        out["rom_l2"] = rom_l2s
        out["rom_order"] = convergence_order(rom_l2s, deltats)
    if out_csv:
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["deltat", "fom_l2", "fom_h1"]
                       + (["rom_l2"] if rom_modes is not None else []))
            for i, dt_val in enumerate(deltats):
                row = [dt_val, l2s[i], h1s[i]]
                if rom_modes is not None:
                    row.append(rom_l2s[i])
                w.writerow(row)
    return out
