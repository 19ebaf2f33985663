"""Dense factorization kernels: QR, Jacobi SVD, power-method SVD, engine."""

from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import (  # noqa: F401
    cholesky_qr,
    cholesky_qr2,
    cholesky_qr3,
    orthonormal_basis,
    qr_full,
    qr_reduced,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import (  # noqa: F401
    givens_rotation,
    jacobi_svd,
    make_jacobi,
    round_robin_schedule,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (  # noqa: F401
    fused_sketch_matmul,
    quantize_uint8,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.power import (  # noqa: F401
    PowerSVDResult,
    power_svd,
    power_triplet,
    theoretical_iterations,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import (  # noqa: F401
    SVD,
    SVDMethod,
    svd,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.incremental import (  # noqa: F401
    IncrementalSVD,
    svd_append_columns,
)
