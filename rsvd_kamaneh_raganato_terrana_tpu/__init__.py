"""TPU-native randomized low-rank factorization engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
project AMSC22-23/rSVD_Kamaneh_Raganato_Terrana (Eigen + MPI + OpenMP
randomized SVD): the rSVD pipeline (Gaussian sketch, power-iteration subspace
refinement, blocked QR, small dense SVD tail), standalone Power / Jacobi /
parallel-Jacobi SVD engines, row-sharded multi-chip execution over a
`jax.sharding.Mesh` (XLA collectives replacing MPI Gatherv/Bcast), and the
downstream applications (image compression, PCA, POD model-order reduction
for a 1D advection-diffusion solver) rebuilt on the same core.

Layer map (mirrors SURVEY.md section 7):

- ``core``   — mesh/sharding helpers, deterministic RNG, MatrixMarket IO,
               config system, profiling, checkpointing.
- ``ops``    — sharded primitive ops (matmul/matvec/norm/normalize/transpose),
               the TPU equivalent of the reference's MPI primitive gallery
               (reference: image_compression/mpi/*.cpp).
- ``linalg`` — factorization kernels: CholeskyQR2/3 thin QR, one-sided
               tournament Jacobi SVD, power-method-with-deflation SVD, and
               the method-dispatched SVD engine (reference:
               include/SVD_class.hpp, src/QR.cpp, src/PM.cpp).
- ``rsvd``   — the randomized SVD driver (reference: src/rSVD.cpp).
- ``apps``   — PCA, image compression, POD + 1D advection-diffusion FOM/ROM
               (reference: PCA/, image_compression/, POD/).
"""

__version__ = "0.1.0"

from rsvd_kamaneh_raganato_terrana_tpu.core import (  # noqa: F401
    make_mesh,
    read_matrix_market,
    write_matrix_market,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg import (  # noqa: F401
    SVD,
    SVDMethod,
    cholesky_qr2,
    jacobi_svd,
    power_svd,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd, generate_omega  # noqa: F401
