"""Preset experiment configurations.

Replaces the reference's eight bash launch scripts
(``shells/pretraining/*.bash``): each preset reproduces one script's flag set
as a typed config.  Paths default to the shipped raw data under
``/root/reference/data`` and our regenerated preprocessing artifacts under
``artifacts/`` (the reference's ``data/preprocessing`` outputs are not
shipped; ``python -m pcnerf_tpu.preprocess.pipeline`` recreates them).
"""

from __future__ import annotations

import dataclasses
import json
import os

from pcnerf_tpu.config import (
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    OptimConfig,
    RenderConfig,
    TrainConfig,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data"


def _n_children(artifact_dir: str, fallback: int) -> int:
    meta = os.path.join(artifact_dir, "preprocess_meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)["n_children"]
    return fallback


def override_art_dir(data: DataConfig, art: str) -> DataConfig:
    """Point an existing DataConfig at a different preprocessing tree
    (preprocessing-ablation experiments: same scene, different child set)."""
    return dataclasses.replace(
        data,
        subnerf_path=os.path.join(art, "sub_pointcloud/split_child_nerf2"),
        parentnerf_path=(os.path.join(art, "source.pcd")
                         if data.parentnerf_path else ""),
        result_path=art,
        sub_nerf_count=_n_children(art, data.sub_nerf_count))


def _art_dir(base: str, sparsity: str) -> str:
    """Per-sparsity artifact dir: the fused map, children, and ray buffers
    all depend on which frames are TRAIN frames, so non-default sparsities
    get their own preprocessing output (the reference rebuilt in place,
    gated by hand via re_loaddata — a silent-collision hazard)."""
    return base if sparsity == "20" else f"{base}_s{sparsity}"


def kitti00_data(sparsity: str = "20") -> DataConfig:
    art = _art_dir(os.path.join(REPO, "artifacts/kitti00/1151_1200_view"),
                   sparsity)
    cfg = DataConfig(
        dataset="kitti",
        root_dir=f"{REF_DATA}/kitti/00/pcd_remove_dynamic",
        pose_path=f"{REF_DATA}/kitti/00/poses.txt",
        subnerf_path=os.path.join(art, "sub_pointcloud/split_child_nerf2"),
        parentnerf_path=os.path.join(art, "source.pcd"),
        result_path=art,
        data_start=1150, data_end=1200,
        sub_nerf_count=_n_children(art, 15327),
        surface_expand=0.05,
        range_delete=(3.0, 2.0, 1.25),
        over_height=0.168, over_low=-2.0,
        interest_x=20.0, interest_y=20.0,
        cloud_size_val=4096,
    )
    return dataclasses.replace(cfg, split=dataclasses.replace(cfg.split,
                                                              sparsity=sparsity))


def maicity00_data(sparsity: str = "20") -> DataConfig:
    art = _art_dir(os.path.join(REPO, "artifacts/maicity00/maicity_00_1"),
                   sparsity)
    cfg = DataConfig(
        dataset="maicity",
        root_dir=f"{REF_DATA}/maicity/00/pcd",
        pose_path=f"{REF_DATA}/maicity/00/poses.txt",
        subnerf_path=os.path.join(art, "sub_pointcloud/split_child_nerf2"),
        parentnerf_path="",
        result_path=art,
        data_start=0, data_end=50,
        sub_nerf_count=_n_children(art, 5661),
        surface_expand=0.05,
        range_delete=(2.0, 1.0, 0.5),
        parent_min=(-12.0, -12.0, -2.0), parent_max=(61.0, 12.0, 0.5),
        cloud_size_val=4096,
    )
    return dataclasses.replace(cfg, split=dataclasses.replace(cfg.split,
                                                              sparsity=sparsity))


def _train(data: DataConfig, exp: str, *, pcnerf: bool,
           decay_gamma: float, compute_dtype: str = "float32") -> TrainConfig:
    """Shared trainer flags of the four *_train.bash scripts."""
    if data.split.sparsity != "20":
        exp = f"{exp}_s{data.split.sparsity}"
    return TrainConfig(
        exp_name=exp,
        seed=42,
        batch_size=256,
        batch_size_val=256,
        num_epochs=1,
        model=ModelConfig(compute_dtype=compute_dtype),
        render=RenderConfig(
            n_samples=768, n_importance=1536, perturb=1.0, noise_std=0.0,
            use_segmented_sample=pcnerf, child_ratio=0.1 if pcnerf else 0.0),
        loss=LossConfig(
            lambda_loss=1.0, lambda_loss_fine=1.0,
            lambda_child_free=1e6 if pcnerf else 0.0,
            lambda_child_depth=1e5 if pcnerf else 0.0,
            use_child_nerf_loss=pcnerf, use_child_nerf_divide=False,
            sub_nerf_count=data.sub_nerf_count),
        optim=OptimConfig(lr=5e-4, weight_decay=1e-3,
                          decay_gamma=decay_gamma),
        data=data,
    )


def kitti00_pcnerf_train(sparsity="20", **kw) -> TrainConfig:
    """KITTI00_pcnerf_train.bash"""
    return _train(kitti00_data(sparsity), "kitti00/1151_1200_view/pcnerf",
                  pcnerf=True, decay_gamma=0.2, **kw)


def kitti00_originalnerf_train(sparsity="20", **kw) -> TrainConfig:
    """KITTI00_originalnerf_train.bash (child losses and segmented sampling off)"""
    return _train(kitti00_data(sparsity), "kitti00/1151_1200_view/originalnerf",
                  pcnerf=False, decay_gamma=0.2, **kw)


def maicity00_pcnerf_train(sparsity="20", **kw) -> TrainConfig:
    """MaiCity00_pcnerf_train.bash"""
    return _train(maicity00_data(sparsity), "maicity00/maicity_00_1/pcnerf",
                  pcnerf=True, decay_gamma=0.1, **kw)


def maicity00_originalnerf_train(sparsity="20", **kw) -> TrainConfig:
    """MaiCity00_originalnerf_train.bash"""
    return _train(maicity00_data(sparsity), "maicity00/maicity_00_1/originalnerf",
                  pcnerf=False, decay_gamma=0.1, **kw)


def kitti00_eval(method: int = 2, sparsity="20",
                 compute_dtype: str = "bfloat16") -> EvalConfig:
    """KITTI00_{pcnerf,originalnerf}_eval.bash (bf16 MLP by default: the
    eval MLP is MXU-bound; fp32-vs-bf16 depth differences are well below the
    0.2 m metric threshold — validated per-frame in round 1).

    The reference evaluates with a SMALLER vehicle-body crop than it trains
    with (eval bash: --range_delete_x 2 --range_delete_y 1 --range_delete_z
    0.5 vs the train bash's 3/2/1.25), so eval GT clouds include near-vehicle
    points the train rays never saw; reproduced here."""
    data = kitti00_data(sparsity)
    data = dataclasses.replace(data, range_delete=(2.0, 1.0, 0.5))
    return EvalConfig(
        depth_inference_method=method,
        n_samples=4096, n_importance=8192, batch_size=4096,
        model=ModelConfig(compute_dtype=compute_dtype),
        data=data)


def maicity00_eval(method: int = 2, sparsity="20",
                   compute_dtype: str = "bfloat16") -> EvalConfig:
    """MaiCity00_{pcnerf,originalnerf}_eval.bash (batch 18432,
    eval_kitti_render.py:979)"""
    return EvalConfig(
        depth_inference_method=method,
        n_samples=4096, n_importance=8192, batch_size=18432,
        model=ModelConfig(compute_dtype=compute_dtype),
        data=maicity00_data(sparsity))


PRESETS = {
    "kitti00_pcnerf": kitti00_pcnerf_train,
    "kitti00_originalnerf": kitti00_originalnerf_train,
    "maicity00_pcnerf": maicity00_pcnerf_train,
    "maicity00_originalnerf": maicity00_originalnerf_train,
}
