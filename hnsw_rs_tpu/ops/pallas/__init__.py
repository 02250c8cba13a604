"""Pallas TPU kernels for the hot dense ops."""

from .l2_kernel import pairwise_l2sq_pallas

__all__ = ["pairwise_l2sq_pallas"]
