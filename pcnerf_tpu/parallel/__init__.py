from pcnerf_tpu.parallel.gspmd import (  # noqa: F401
    make_gspmd_train_scan,
    make_gspmd_train_step,
    make_gspmd_val_step,
    replicate_state,
)
from pcnerf_tpu.parallel.mesh import make_mesh  # noqa: F401
from pcnerf_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step,
    param_pspecs,
    shard_train_state,
)
