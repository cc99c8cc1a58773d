"""mrcal_tpu — a TPU-native camera-calibration / SfM engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of mrcal
(reference: dkogan/mrcal): lens-model projection, sparse nonlinear
least-squares bundle adjustment (Schur-complement reduced, shardable over a
TPU mesh), projection/state uncertainty propagation, triangulation and
stereo rectification.

Public API mirrors the mrcal namespace where it makes sense; everything is a
pure JAX function (broadcasting via vmap semantics, gradients via AD).
"""

from . import _xla  # noqa: F401  — must run first: enables x64

from .poseutils import *        # noqa: F401,F403
from .lensmodels import (       # noqa: F401
    lensmodel_metadata_and_config,
    lensmodel_num_params,
    supported_lensmodels,
    knots_for_splined_models,
)
from .projections import (      # noqa: F401
    project, unproject,
    project_pinhole, unproject_pinhole,
    project_stereographic, unproject_stereographic,
    project_lonlat, unproject_lonlat,
    project_latlon, unproject_latlon,
)
from .optimize import (         # noqa: F401
    optimize, optimize_batch, pad_problems_to_common_structure,
    optimizer_callback,
    drt_cross_reprojection__dbpacked,
    num_states, num_measurements,
    num_states_intrinsics, num_states_extrinsics, num_states_frames,
    num_states_points, num_states_calobject_warp,
    num_measurements_boards, num_measurements_points,
    num_measurements_points_triangulated, num_measurements_regularization,
    state_index_intrinsics, state_index_extrinsics, state_index_frames,
    state_index_points, state_index_calobject_warp,
    measurement_index_boards, measurement_index_points,
    measurement_index_regularization,
    measurement_index_points_triangulated,
    num_intrinsics_optimization_params,
    decode_observation_indices_points_triangulated,
    pack_state, unpack_state,
    corresponding_icam_extrinsics,
)
from .cameramodel import cameramodel, CameramodelParseException  # noqa: F401
from .factorization import CHOLMOD_factorization  # noqa: F401
from .synthetic_data import (   # noqa: F401
    ref_calibration_object,
    synthesize_board_observations,
    make_perfect_observations,
    make_tracks,
)
from .triangulation import (    # noqa: F401
    triangulate_geometric,
    triangulate_lindstrom,
    triangulate_leecivera_l1,
    triangulate_leecivera_linf,
    triangulate_leecivera_mid2,
    triangulate_leecivera_wmid2,
    triangulate,
)
from .utils import (            # noqa: F401
    apply_homography,
    align_procrustes_points_Rt01,
    align_procrustes_vectors_R01,
    sample_imager,
    sample_imager_unproject,
    ingest_packed_state,
    sorted_eig,
    hypothesis_board_corner_positions,
    measurements_board, residuals_board,
    measurements_point, residuals_point,
    close_contour, polygon_difference,
    write_point_cloud_as_ply,
    plotoptions_state_boundaries, plotoptions_measurement_boundaries,
    mapping_file_framenocameraindex,
)
from .detector import (         # noqa: F401
    chess_response, find_chessboard_corners, detect_corners_in_images,
)
from .calibration import (      # noqa: F401
    compute_chessboard_corners,
    estimate_monocular_calobject_poses_Rt_tocam,
    estimate_joint_frame_poses,
    seed_stereographic,
    traverse_sensor_links,
)
from .stereo_sgm import stereo_matching_sgm     # noqa: F401
from .stereo import (           # noqa: F401
    rectified_resolution, rectified_system, rectification_maps,
    stereo_range, stereo_unproject, match_feature, stereo_matching_ncc,
)
from .model_analysis import (   # noqa: F401
    projection_uncertainty,
    projection_diff,
    stereo_pair_diff,
    implied_Rt10__from_unprojections,
    worst_direction_stdev,
    is_within_valid_intrinsics_region,
    model_resolution__deg_pixel,
)
from .image_transforms import ( # noqa: F401
    pinhole_model_for_reprojection,
    image_transformation_map,
    transform_image,
    scale_focal__best_pinhole_fit,
)
from .image import load_image, save_image, apply_color_map  # noqa: F401
from .cahvor import read_transforms  # noqa: F401
from . import profiling  # noqa: F401
from .visualization import (  # noqa: F401
    show_geometry,
    show_projection_diff,
    show_stereo_pair_diff,
    fitted_gaussian_equation,
    imagergrid_using,
    show_projection_uncertainty,
    show_projection_uncertainty_vs_distance,
    show_distortion_off_pinhole,
    show_distortion_off_pinhole_radial,
    show_valid_intrinsics_region,
    show_splined_model_correction,
    show_residuals_board_observation,
    show_residuals_histogram,
    show_residuals_vectorfield,
    show_residuals_magnitudes,
    show_residuals_directions,
    show_residuals_regional,
    annotate_image__valid_intrinsics_region,
)

__version__ = "0.1.0"
