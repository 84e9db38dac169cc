"""TPU-native ops: pose math and point-cloud kernels.

Replaces the reference's CUDA extension
(``networks/pts_encoder/pointnet2_utils/pointnet2/src/``) and
``utils/misc.py`` rotation utilities with JAX/Pallas equivalents.
"""

from genpose_tpu.ops.pose import (  # noqa: F401
    average_quaternion_batch,
    get_pose_dim,
    get_rot_matrix,
    inverse_RT,
    matrix_to_quat_wxyz,
    matrix_to_rot6d,
    normalize_rotation,
    quat_wxyz_to_matrix,
    rot6d_to_matrix,
    rot_diff_degree,
    rot_diff_rad,
    transform_batch_pts,
)
from genpose_tpu.ops.pointcloud import (  # noqa: F401
    ball_query,
    ball_query_ref,
    farthest_point_sample,
    farthest_point_sample_ref,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
