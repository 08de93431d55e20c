from pcnerf_tpu.models.embedding import embed_positions, embedding_dim  # noqa: F401
from pcnerf_tpu.models.nof import (  # noqa: F401
    collapse_active,
    collapse_eval_params,
    collapse_folded_params,
    fold_batchnorm,
    fused_embed_active,
    init_nof,
    nof_apply,
    nof_apply_collapsed,
    nof_apply_collapsed_fused,
    nof_apply_folded,
    nof_apply_train,
    nof_apply_train_collapsed,
    nof_apply_train_collapsed_fused,
)
