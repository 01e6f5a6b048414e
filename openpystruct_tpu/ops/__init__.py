"""Pallas TPU kernels for the hot compute paths."""

from openpystruct_tpu.ops.block_tridiag import (
    pallas_block_tridiag_solve,
    pallas_solve_sym,
)

__all__ = ["pallas_block_tridiag_solve", "pallas_solve_sym"]
