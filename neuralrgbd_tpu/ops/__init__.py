"""Geometry core: pure-functional, jit-safe ops shared by all layers."""

from neuralrgbd_tpu.ops.camera import (
    Camera,
    camera_from_K,
    intrinsics_for_size,
    rescale_K,
    unit_rays,
)
from neuralrgbd_tpu.ops.sampling import grid_sample_2d, grid_sample_3d
from neuralrgbd_tpu.ops.sweep import (
    sweep_cost_volume,
    warp_to_ref_over_depths,
    backward_warp_by_depth,
)
from neuralrgbd_tpu.ops.dpv import (
    depth_regression,
    depth_variance,
    confidence_map,
    dpv_statistics,
    resample_dpv,
    uniform_dpv,
)
from neuralrgbd_tpu.ops.rotations import (
    quat_to_rotation,
    rotation_to_quat,
    unitq_to_quat,
    quat_to_unitq,
    unitq_to_rotation,
    rotation_to_unitq,
    rel_extrinsics,
)
