"""Applications built on the rSVD core: PCA, image compression, POD/ROM."""

from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import (  # noqa: F401
    PCA,
    load_athletic_dataset,
    load_tourists_dataset,
)
from rsvd_kamaneh_raganato_terrana_tpu.apps.image import Image, TileFactors  # noqa: F401
from rsvd_kamaneh_raganato_terrana_tpu.apps.kpca import (  # noqa: F401
    KernelPCA,
    kernel_matrix,
)
from rsvd_kamaneh_raganato_terrana_tpu.apps.pod import (  # noqa: F401
    POD,
    energy_pod,
    incremental_pod,
    make_pod,
    naive_pod,
    perform_svd,
    standard_pod,
    weight_pod,
)
from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff, retrieval, rom  # noqa: F401
