"""Preprocessing transforms (role of reference ``auto_round/algorithms/
transforms/``): Hadamard rotation (QuaRot R1), AWQ smoothing."""

from .awq import awq_smooth_block
from .hadamard import apply_r1_rotation, fuse_rms_gains, hadamard_matrix

__all__ = ["apply_r1_rotation", "fuse_rms_gains", "hadamard_matrix",
           "awq_smooth_block"]
