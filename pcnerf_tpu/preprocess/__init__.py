from pcnerf_tpu.preprocess.fusion import fuse_scans  # noqa: F401
from pcnerf_tpu.preprocess.split import grid_split_cluster, huafen_edges  # noqa: F401
