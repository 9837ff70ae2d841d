"""SLAM/SfM layer: frontend, BA, pose graph, pipelines, evaluation
(the distributed extension beyond the reference, SURVEY.md §7 stage 7)."""
from compv_tpu.slam.frontend import FrontendConfig, PairResult, match_pair, detect_describe  # noqa: F401
from compv_tpu.slam.ba import (  # noqa: F401
    BAProblem, BAConfig, ba_solve, ba_step, ba_residuals, reproj_rmse,
    rodrigues_to_matrix, matrix_to_rodrigues, project_points,
)
from compv_tpu.slam.posegraph import (  # noqa: F401
    PoseGraph, PoseGraphConfig, optimize_pose_graph, compose, invert,
    relative_pose,
)
from compv_tpu.slam.pipeline import (  # noqa: F401
    PlanarTrackerConfig, PlanarTrackResult, track_planar_sequence,
    KeyframeStore, decompose_homography,
)
from compv_tpu.slam.evaluate import umeyama_alignment, ate_rmse, rpe_rmse  # noqa: F401
from compv_tpu.slam.ba_schur import SchurConfig, ba_solve_schur, ba_step_schur  # noqa: F401
from compv_tpu.slam.sfm import (  # noqa: F401
    SfmConfig, SfmResult, run_sfm, resume_sfm, sfm_ate,
    render_orbit_sequence,
)
