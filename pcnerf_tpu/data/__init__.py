from pcnerf_tpu.data.pcd_io import read_pcd, write_pcd, pcd_aabb  # noqa: F401
from pcnerf_tpu.data.poses import (  # noqa: F401
    T_VELO2CAM_KITTI,
    load_kitti_poses,
    load_raw_poses,
)
