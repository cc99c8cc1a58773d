"""Pallas TPU kernels for the hot ops.

XLA fuses most of this framework's compute well (the normal-equation build
is batched einsum on the MXU); these kernels cover the spots where the
generic lowering is weak — batched TINY linear algebra (6x6/3x3 Cholesky
factor+solve for the Schur elimination), where XLA's batched Cholesky
lowering serializes poorly for small blocks.
"""

from .batched_cholesky import (  # noqa: F401
    batched_cholesky_solve_pallas,
    batched_cholesky_solve,
)
