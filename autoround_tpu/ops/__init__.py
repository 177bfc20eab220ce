"""Pallas TPU kernels (role of reference ``auto_round_extension`` kernels)."""

from .flash_attention import flash_attention, flash_attention_ref
from .qmatmul import pack_w4_planes, unpack_w4_planes, w4a16_matmul

__all__ = ["w4a16_matmul", "pack_w4_planes", "unpack_w4_planes",
           "flash_attention", "flash_attention_ref"]
