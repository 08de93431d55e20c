"""Typed configuration system.

Replaces the reference's two independent argparse flag sets
(``nof/nof_utils.py:8-154`` and ``eval_kitti_render.py:19-133``) plus its
edit-the-source switches.  Two reference behaviors that were hardcoded comment
blocks are promoted to real config keys here:

- frame sparsity (the eight commented modulus lines,
  ``nof/dataset/ipb2dmapping.py:647-654``) -> :class:`FrameSplit` presets;
- the child-mask expansion base threshold (``nof/render.py:92``
  ``expand_threshold = 2``) -> ``RenderConfig.child_mask_gamma0``.

Defaults reproduce the shipped KITTI-00 experiment
(``shells/pretraining/KITTI00_pcnerf_train.bash``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


# ---------------------------------------------------------------------------
# Frame split (sparsity) presets
# ---------------------------------------------------------------------------

# Each preset is (offset, modulus, train_on_nonzero).  A frame index j (python
# range over [data_start, data_end)) is a TRAIN frame iff
#   ((j + 1 - offset - data_start) % modulus != 0) == train_on_nonzero
# Test frames are the complement.  This reproduces the comment blocks at
# ipb2dmapping.py:647-654 and eval_kitti_render.py:1055-1062 exactly.
SPARSITY_PRESETS = {
    "20": (3, 5, True),
    "25": (0, 4, True),
    "33": (0, 3, True),
    "50": (0, 2, True),
    "67": (1, 3, False),
    "75": (1, 4, False),
    "80": (3, 5, False),
    "90": (5, 10, False),
}


@dataclass(frozen=True)
class FrameSplit:
    """Train/val/test frame selection along the trajectory."""

    sparsity: str = "20"           # key into SPARSITY_PRESETS
    # Validation always uses the 20%-style held-out frames in the reference
    # (train_kitti val branch: (j+1-3)%5==0, ipb2dmapping.py:656).
    val_offset: int = 3
    val_modulus: int = 5
    # KITTI's val predicate does NOT subtract data_start (ipb2dmapping.py:656)
    # while MaiCity's does (ipb2dmapping.py:313); for the shipped data_start
    # values the two coincide.  Kept configurable for exactness.
    val_subtract_start: bool = True

    def is_train_frame(self, j: int, data_start: int) -> bool:
        off, mod, on_nonzero = SPARSITY_PRESETS[self.sparsity]
        nz = (j + 1 - off - data_start) % mod != 0
        return nz == on_nonzero

    def is_val_frame(self, j: int, data_start: int) -> bool:
        base = data_start if self.val_subtract_start else 0
        return (j + 1 - self.val_offset - base) % self.val_modulus == 0

    def is_test_frame(self, j: int, data_start: int) -> bool:
        return not self.is_train_frame(j, data_start)


# ---------------------------------------------------------------------------
# Model / render / loss / optim
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModelConfig:
    """NOF occupancy MLP (reference ``nof/networks/models.py:44-123``)."""

    feature_size: int = 256
    n_freq: int = 10               # L_pos; embedding dim = 3 + 3*2*n_freq = 63
    logscale: bool = True
    use_skip: bool = True
    # The reference constructs nn.LeakyReLU(True): the positional arg is
    # negative_slope, so slope == float(True) == 1.0 and every "activation" is
    # the identity (models.py:72,92).  We reproduce that topology: slope 1.0
    # after each layer1 block (plus the 4 strays appended during layer2
    # construction), and *no* activation inside layer2.  Setting this < 1
    # yields the presumably-intended LeakyReLU network.
    negative_slope: float = 1.0
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1       # torch BatchNorm1d default running-stat mix
    # Matmul compute dtype. Params are always float32; "bfloat16" casts matmul
    # operands and accumulates in float32 on the MXU.
    compute_dtype: str = "float32"
    # Affine collapse: with identity activations (slope 1.0, the reference's
    # quirk) the whole MLP is an affine map of the embedding given batch
    # statistics, so the 9 activation matmuls fold into one 63->1 matvec —
    # mathematically identical forward + gradients, ~10x faster on TPU (the
    # activation HBM traffic disappears).  "auto" enables it exactly when
    # negative_slope == 1.0; "on"/"off" force it (see models/nof.py).
    collapse_affine: str = "auto"
    # Rematerialize the training-mode MLP in the backward pass
    # (jax.checkpoint): trades ~1/3 more MXU FLOPs for not storing the
    # 9 x (rays*samples, 256) activations in HBM.  Only relevant when the
    # collapse is off (negative_slope != 1); benchmarked in PERF.md.
    remat_mlp: bool = False
    # Pallas fused-embedding collapse path (ops/pallas_train.py): computes
    # the embedding's batch moments and the folded matvec in grid kernels
    # that recompute E tile-wise in VMEM instead of materializing the
    # (rays*samples, 63) embedding — the round-5 trace showed that
    # materialization (+ its backward) is ~60% of the collapsed step.
    # "auto" = on when the collapse is active, bands are logscale and the
    # backend is real TPU; "on" forces it (interpret mode off-TPU; how the
    # CPU tests exercise it); "off" = the round-4 XLA collapse path.
    # Default "auto" since the end-to-end gate passed: a full KITTI 20%
    # train+eval on the fused path reproduces the published XLA-path cell
    # to the fourth decimal (CD 0.20616 vs 0.20619, F 0.89935 vs 0.89932 —
    # logs_bg/eval_kitti_fused_r5.log) at 1.61x the step speed.  The
    # published RESULTS.md rows were measured with "off" (noted there);
    # kernels measured at XLA-f32 accuracy on hardware
    # (logs_bg/fused_check_r5.log), bounds in tests/test_pallas_train.py.
    fused_embed: str = "auto"

    @property
    def in_channels(self) -> int:
        return 3 + 3 * 2 * self.n_freq


@dataclass(frozen=True)
class RenderConfig:
    """Sampling + volume compositing (reference ``nof/render.py``)."""

    n_samples: int = 768
    n_importance: int = 1536
    perturb: float = 1.0
    noise_std: float = 0.0
    epsilon: float = 1e-10
    use_disp: bool = False
    # Segmented (parent/child) stratified sampling, render.py:429-442.
    use_segmented_sample: bool = True
    child_ratio: float = 0.1       # segmentated_child_nerf_ratio
    # Child-mask gamma expansion (render.py:75-99): the free-loss mask starts
    # at gamma0=0.0, the depth-loss mask at gamma0=2.0 (the hardcoded
    # ``expand_threshold = 2``), both growing in 0.01 steps until >=1 sample
    # falls inside the child interval.
    child_mask_gamma0_free: float = 0.0
    child_mask_gamma0: float = 2.0
    child_mask_gamma_step: float = 0.01
    # Importance-sampling bracketing implementation: "sort" (r3's sort-native
    # chain), "dense" (masked-reduction brackets, bit-identical output), or
    # "auto" (dense at train-class M*K, sort at eval-class — see
    # ops/sampling.py:sample_pdf_merged_auto and scripts/pdf_dense_bench.py).
    pdf_bracket: str = "sort"


@dataclass(frozen=True)
class LossConfig:
    """Three-level loss weights (train_kitti.py:127-155)."""

    loss_type: str = "smoothl1"    # mse | l1 | smoothl1
    lambda_loss: float = 1.0
    lambda_loss_fine: float = 1.0
    lambda_child_free: float = 1e6
    lambda_child_depth: float = 1e5
    # Opacity regularizer weight (reference render.py:224 computes the term
    # in its legacy path; 0 by default — the shipped trainer never adds it).
    # Positive values push per-sample occupancy toward {0, 1}, the designed
    # lever against the diffuse near-origin background occupancy that the
    # one-step parent-bound compositing integrates (RESULTS.md note 3).
    lambda_opacity: float = 0.0
    use_child_nerf_loss: bool = True
    use_child_nerf_divide: bool = False
    sub_nerf_count: int = 15333    # number of child NeRF AABBs


@dataclass(frozen=True)
class OptimConfig:
    """Adam + MultiStep LR (train_kitti.py:108-115, nof_utils.py:162-173)."""

    optimizer: str = "adam"
    lr: float = 5e-4
    weight_decay: float = 1e-3     # torch-Adam style: added to the gradient
    adam_eps: float = 1e-8
    momentum: float = 0.9          # for sgd
    # Epoch milestones are hardcoded in the reference (train_kitti.py:113).
    decay_milestones: Tuple[int, ...] = (5, 120, 256)
    decay_gamma: float = 0.2


@dataclass(frozen=True)
class DataConfig:
    """Dataset + ray-buffer compiler (reference ``nof/dataset/ipb2dmapping.py``)."""

    dataset: str = "kitti"         # kitti | maicity
    root_dir: str = "/root/reference/data/kitti/00/pcd_remove_dynamic"
    pose_path: str = "/root/reference/data/kitti/00/poses.txt"
    subnerf_path: str = ""         # directory of {1..N}.pcd child clouds
    parentnerf_path: str = ""      # fused source.pcd (KITTI parent AABB)
    result_path: str = ""          # cache / output directory
    data_start: int = 1150
    data_end: int = 1200
    sub_nerf_count: int = 15333
    surface_expand: float = 0.05
    child_pad: float = 0.025       # AABB padding (ipb2dmapping.py:608)
    range_delete: Tuple[float, float, float] = (3.0, 2.0, 1.25)  # vehicle body
    max_range: float = 120.0
    over_height: float = 0.168
    over_low: float = -2.0
    interest_x: float = 20.0
    interest_y: float = 20.0
    # MaiCity parent AABB comes from explicit bounds, not a PCD:
    parent_min: Tuple[float, float, float] = (-12.0, -12.0, -2.0)
    parent_max: Tuple[float, float, float] = (61.0, 12.0, 0.5)
    cloud_size_val: int = 4096
    split: FrameSplit = field(default_factory=FrameSplit)


@dataclass(frozen=True)
class TrainConfig:
    exp_name: str = "kitti00/1151_1200_view"
    seed: int = 42
    batch_size: int = 256
    batch_size_val: int = 256
    num_epochs: int = 1
    log_every: int = 50
    # Steps fused per device dispatch via lax.scan (train/system.py:
    # make_train_scan).  At the reference batch size a step is ~1 ms of MXU
    # work, so per-step host dispatch dominates; scanning amortizes it K-fold
    # with identical math.  0/1 disables (per-step dispatch).
    scan_steps: int = 50
    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)


@dataclass(frozen=True)
class EvalConfig:
    """Two-step / one-step depth inference (eval_kitti_render.py)."""

    depth_inference_method: int = 2   # 2=two-step, 1=one-step
    n_samples: int = 4096
    n_importance: int = 8192
    batch_size: int = 4096            # 18432 for maicity (eval:979,1111)
    smooth_sigma: float = 5.0         # gaussian smoothing of weights
    center_dist_prefilter: float = 0.65
    use_pallas: bool = False          # fused PE+MLP kernel for the eval MLP
    ckpt_path: str = ""
    pcd_path: str = ""
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)


# ---------------------------------------------------------------------------
# (De)serialization helpers
# ---------------------------------------------------------------------------

def _from_dict(cls, d: dict) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            v = _from_dict(f.type, v)
        elif f.name in ("model", "render", "loss", "optim", "data", "split"):
            sub = {"model": ModelConfig, "render": RenderConfig,
                   "loss": LossConfig, "optim": OptimConfig,
                   "data": DataConfig, "split": FrameSplit}[f.name]
            v = _from_dict(sub, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str, cls=TrainConfig):
    with open(path) as f:
        return _from_dict(cls, json.load(f))


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
