from pcnerf_tpu.models.embedding import embed_positions, embedding_dim  # noqa: F401
from pcnerf_tpu.models.nof import (  # noqa: F401
    init_nof,
    nof_apply,
    nof_apply_train,
    fold_batchnorm,
    nof_apply_folded,
)
