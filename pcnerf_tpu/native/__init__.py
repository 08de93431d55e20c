from pcnerf_tpu.native.lib import (  # noqa: F401
    ground_filter,
    native_available,
    nn_distances,
    region_grow,
)
