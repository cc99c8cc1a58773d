"""Multi-device sharded bundle adjustment."""

from .sharding import (  # noqa: F401
    make_mesh,
    sharded_normal_equations,
    sharded_lm_step,
    sharded_lm_solve,
    sharded_lm_solve_device,
)
