"""Linear-algebra kernels producing the coaddition matrix T and quality maps."""

from .kernels import (  # noqa: F401
    KERNELS,
    cholesky_solve,
    cholesky_solve_blocked,
    cholesky_solve_mixed,
    eigen_solve,
    eigen_solve_device,
    empirical_weights,
    iterative_solve,
)
