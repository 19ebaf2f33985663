"""Randomized SVD driver."""

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (  # noqa: F401
    generate_omega,
    reconstruct,
    reconstruction_error,
    rsvd,
    rsvd_image_preset,
    subspace_iteration,
)
