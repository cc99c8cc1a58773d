"""Optimization core: sparse nonlinear least squares, TPU-native.

The reference (mrcal.c:3979-6624) assembles a CSR Jacobian in C and hands it
to libdogleg+CHOLMOD.  Here the residual is one pure JAX function; Jacobian
blocks come from AD per observation; the normal equations are Schur-reduced
(frame/point blocks eliminated with batched small Cholesky solves, the
reduced camera system solved densely on the MXU) and the whole pipeline
shards over a device mesh by observation (see mrcal_tpu.parallel).
"""

from .layout import (  # noqa: F401
    ProblemSelections,
    ProblemSpec,
    spec_from_inputs,
    num_states,
    num_states_intrinsics, num_states_extrinsics, num_states_frames,
    num_states_points, num_states_calobject_warp,
    state_index_intrinsics, state_index_extrinsics, state_index_frames,
    state_index_points, state_index_calobject_warp,
    num_measurements,
    num_measurements_boards, num_measurements_points,
    num_measurements_points_triangulated, num_measurements_regularization,
    measurement_index_boards, measurement_index_points,
    measurement_index_regularization,
    measurement_index_points_triangulated,
    num_intrinsics_optimization_params,
    decode_observation_indices_points_triangulated,
    pack_state, unpack_state,
    corresponding_icam_extrinsics,
)
from .residuals import (  # noqa: F401
    optimizer_callback,
    drt_cross_reprojection__dbpacked,
)
from .solver import (optimize, optimize_batch,  # noqa: F401
                     pad_problems_to_common_structure)
