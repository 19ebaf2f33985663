"""Unified configuration system.

The reference spreads configuration over three mechanisms — CLI argv,
a hand-rolled keyword parser for the POD driver files
(POD/.../Diff1D.cpp:50-91), and deal.II ParameterHandler ``.prm`` files
(AdvDiff1D.hpp:282-293) — with the rSVD hyperparameters k/p/q hardcoded at
call sites (e.g. q=2 at src/rSVD.cpp:83, p=16 at tests/rSVD_test.cpp:65-67).
Here everything is a dataclass, and parsers are provided for both reference
file formats so the reference's own input files run unmodified.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass
from typing import Optional


@dataclass
class RSVDConfig:
    """Hyperparameters of the randomized SVD driver (reference rSVD,
    src/rSVD.cpp:72-133: k target rank, p oversampling, q power iterations).
    """

    k: int = 0              # target rank; 0 = use l = p only (reference test preset)
    p: int = 10             # oversampling (reference: 16 root tests, 10 image)
    q: int = 2              # power iterations (reference: 2 root, 1 image stack)
    method: str = "jacobi"  # small-SVD tail engine {jacobi, power, parallel_jacobi}
    sketch: str = "gaussian"
    seed: int = 0

    @property
    def l(self) -> int:
        return self.k + self.p


@dataclass(frozen=True)
class AdvDiffConfig:
    """FEM full-order-model parameters (reference .prm files,
    POD/ParametricDiffusion1D/input/test_advdiff_00.prm).

    Frozen (hashable) so it can ride as a static argument of jitted
    solvers (apps/advdiff.py, apps/rom.py)."""

    beta: float = 0.2          # transport coefficient
    u0_choice: int = 0         # initial condition / manufactured solution id (0-3)
    amplitude: float = 3.0     # IC amplitude
    N: int = 119               # interior mesh intervals parameter: n_nodes = N+2
    degree: int = 1            # FE degree (P1 supported)
    T: float = 0.05            # final time
    deltat: float = 1e-3       # time step
    theta: float = 1.0         # theta-method parameter (1 = implicit Euler)
    sample_every: int = 1      # snapshot sampling stride

    @property
    def n_nodes(self) -> int:
        # deal.II subdivided_hyper_cube(N+1) => N+2 nodes (AdvDiff1D.cpp:21-24)
        return self.N + 2

    @property
    def n_steps(self) -> int:
        return round(self.T / self.deltat)


@dataclass(frozen=True)
class PodConfig:
    """POD driver parameters (reference keyword files,
    POD/ParametricDiffusion1D/input/test_pod_00.txt, parsed at
    Diff1D.cpp:50-91).  Frozen/hashable like AdvDiffConfig."""

    dim: int = 1
    n: int = 1                  # number of diffusion parameters in the sweep
    mu_min: float = 0.01
    mu_max: float = 0.05
    mu_new: Optional[float] = None   # unseen parameter (Diff1D_new_prm workflow)
    nthreads: int = 1                # reference OpenMP sweep width (we vmap)
    rank: int = 15
    tol: float = 1e-12
    pod_type: int = 2           # 0 naive, 1 standard, 2 energy, 3 weight
    svd_type: int = 0           # 0/1/2 full SVD {power,jacobi,par-jacobi}; 3/4/5 rSVD
    rom_sizes: tuple = (2, 4, 6, 8)


def _strip_comment(line: str) -> str:
    return line.split("#", 1)[0].strip()


def parse_pod_config(path: str) -> PodConfig:
    """Parse the reference's keyword POD parameter files."""
    kwargs = {}
    with open(path) as f:
        for raw in f:
            line = _strip_comment(raw)
            if not line:
                continue
            parts = line.split()
            key, vals = parts[0], parts[1:]
            if key == "rom_sizes":
                kwargs["rom_sizes"] = tuple(int(v) for v in vals)
            elif key in ("dim", "n", "rank", "pod_type", "svd_type", "nthreads"):
                kwargs[key] = int(vals[0])
            elif key in ("mu_min", "mu_max", "mu_new", "tol"):
                kwargs[key] = float(vals[0])
            # unknown keys ignored, like the reference parser
    return PodConfig(**kwargs)


def parse_prm_config(path: str) -> AdvDiffConfig:
    """Parse deal.II-style ``set key = value`` .prm files."""
    kwargs = {}
    pat = re.compile(r"^\s*set\s+(\w+)\s*=\s*(\S+)")
    with open(path) as f:
        for raw in f:
            line = _strip_comment(raw)
            m = pat.match(line)
            if not m:
                continue
            key, val = m.group(1), m.group(2)
            if key in ("u0_choice", "N", "degree", "sample_every"):
                kwargs[key] = int(val)
            elif key in ("beta", "amplitude", "T", "deltat", "theta"):
                kwargs[key] = float(val)
    return AdvDiffConfig(**kwargs)


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
