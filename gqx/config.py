"""Typed configuration for gqx.

Flag-for-flag parity with the reference CLI (reference main.py:83-122) plus
TPU-native extensions (mesh backend, wire format, dtypes).  The hardcoded
LR-schedule tables of reference main.py:136-157 are reproduced by
:func:`resolve_schedule`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple


# Dataset -> num_classes registry (reference main.py:50-58).
DATASET_CLASSES = {
    "mnist": 10,
    "cifar10": 10,
    "cifar100": 100,
    "stl10": 10,
    "svhn": 10,
    "tinyimg": 200,
    "synthetic": 10,
    # real handwritten digits bundled with scikit-learn (offline MNIST
    # stand-in for convergence-parity runs; gqx/data/datasets.py);
    # digits32 = the same images at 32x32x3 for the conv/BN model families
    "digits": 10,
    "digits32": 10,
}

QUANTIZER_CHOICES = (
    # CLI-reachable in the reference (main.py:20-26)
    "sgd", "qsgd", "hsq", "sign", "topk",
    # exported-but-unregistered compressors (reference compressors/__init__.py:3-7)
    "pvq", "residual", "maurey",
    # named alias: qsgd with n_bit=1 and a whole-tensor bucket
    # (reference README.md:21-26)
    "terngrad",
)

NETWORK_CHOICES = (
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "vgg11", "vgg13", "vgg16", "vgg19", "dense", "fcn", "cnn",
)


@dataclasses.dataclass
class GQConfig:
    """Full training configuration.

    Field defaults mirror the reference argparse defaults
    (reference main.py:83-122) so that the canonical BASELINE.md configs can
    be expressed directly.
    """

    network: str = "resnet18"
    dataset: str = "cifar10"
    num_classes: Optional[int] = None  # None -> resolved from dataset; a user
                                       # value wins (reference main.py:85 lets
                                       # --num-classes override the registry)
    quantizer: str = "hsq"
    mode: str = "ps"                  # 'ps' | 'ring'
    scale: str = "exp"                # EF warmup scale: 'exp' or a float string

    c_dim: int = 32                   # bucket / subvector dimension
    k_bit: int = 8                    # log2 codebook size (HSQ/PVQ)
    n_bit: int = 8                    # scalar-quantization bits
    cr: int = 256                     # top-k compression ratio
    random: bool = True               # stochastic rounding on/off

    num_users: int = 8
    logdir: Optional[str] = None
    batch_size: int = 32
    test_batch_size: int = 1000
    epochs: int = 350
    lr: float = 0.1                   # reference main.py:133 (hardcoded 0.1)
    momentum: float = 0.9
    weight_decay: float = 5e-4
    ef: bool = False                  # error feedback
    seed: int = 1
    log_epoch: int = 1
    save_model: bool = False
    two_phase: bool = False           # server->worker downlink recompression

    # --- TPU-native extensions (no reference counterpart) ---
    backend: str = "sim"              # 'sim' (vmap users on chip) | 'mesh' (shard_map)
    wire: str = "logical"             # 'logical' | 'packed' (real bit-packed payloads)
    compute_dtype: str = "float32"    # model compute dtype ('bfloat16' on TPU is faster)
    passthrough_threshold: int = 1000 # leaves <= this many elements are never
                                      # compressed (reference ps_quantizer.py:17-20)
    grouping: str = "auto"            # 'auto': pack same-config leaves into one
                                      # compression unit (fewer/larger kernels);
                                      # 'none': strict per-layer parity
    quant_layout: str = "outfirst"    # 'torch': flatten each leaf in the
                                      # reference's torch memory layout so the
                                      # subvector/bucket partition matches
                                      # vec.view(-1, dim) exactly (better VQ
                                      # quality on real gradients — see
                                      # packing.torch_axis_order);
                                      # 'outfirst' (default): same
                                      # output-unit-major property via a
                                      # 2D-collapsible (9x faster)
                                      # permutation, identical to 'torch' for
                                      # dense/1x1-conv leaves and measured
                                      # recon-error-equivalent on KxK conv
                                      # gradients (scripts/
                                      # layout_recon_study.py: 0.7176 vs
                                      # 0.7217 weighted rel. L2);
                                      # 'natural': flax layout
    scan_blocks: bool = False         # ResNet: trace repeated stage blocks
                                      # once via nn.scan (much faster XLA
                                      # compile for ResNet-50+; same params)
    ring_mode: str = "chain"          # 'chain': reference-faithful sequential
                                      # chain (ring_quantizer.py semantics);
                                      # 'segmented': bandwidth-optimal
                                      # compressed ring reduce-scatter +
                                      # compressed all-gather (mesh backend)
    codebook_dir: Optional[str] = None
    data_dir: str = "./data"
    use_pallas: Optional[bool] = None # None = auto (TPU only)
    hsq_passes: int = 1               # bf16 matmul passes in the HSQ kernels:
                                      # 1 (default) = bf16-rounded input
                                      # (~0.4% u perturbation, below the
                                      # 6-bit norm-quantization step; encode
                                      # 24.5 -> 17.6 ms); flipped default
                                      # after a 15-seed paired convergence
                                      # gate vs passes=2 measured dead-even
                                      # (Δ = -0.00 ± 0.32 pp 95% CI,
                                      # results/study/fcn_gate_p1.jsonl);
                                      # 2 = fp32-exact vs the bf16-exact
                                      # codebook (strict-parity mode)
    unit_dtype: str = "auto"          # dtype of packed compression units:
                                      # 'auto' = bfloat16 for HSQ units when
                                      # hsq_passes==1, EF off and compute is
                                      # bfloat16 (the passes=1 kernel bf16-
                                      # rounds its input anyway, so carrying
                                      # the units to it in bf16 is the SAME
                                      # rounding with half the pack/encode
                                      # HBM traffic — PERF.md round 4);
                                      # else float32.  'float32'/'bfloat16'
                                      # force.
    folded_users: bool = True         # sim backend: run fwd/bwd on the
                                      # folded U*B batch with ghost-routed
                                      # per-user grads (2x faster backward,
                                      # PERF.md; grads match the vmap path —
                                      # tests/test_folded.py; 10-seed digits
                                      # convergence gate identical seed-for-
                                      # seed: results/folded_gate/gate.json,
                                      # scripts/folded_gate.py)
    mesh_axis: str = "users"
    eval_batch_count: Optional[int] = None  # limit eval batches (None = all)
    dataset_kwargs: Optional[dict] = None   # extra loader kwargs (e.g. the
                                            # digits k-fold split
                                            # fold=(k, i) used by the
                                            # parity power study)
    profile_dir: Optional[str] = None # dump an xprof trace of a few steady-state
                                      # steps here (view with xprof/tensorboard)
    profile_steps: int = 5            # how many steps the trace covers

    def __post_init__(self):
        if self.num_classes is None:
            self.num_classes = DATASET_CLASSES.get(self.dataset, 10)
        if self.quantizer not in QUANTIZER_CHOICES:
            raise ValueError(f"unknown quantizer {self.quantizer!r}")
        if self.mode not in ("ps", "ring"):
            raise ValueError(f"unknown mode {self.mode!r}")

    # -- EF scale schedule (reference ps_quantizer.py:28-31) --
    def ef_scale(self, epoch: float) -> float:
        if self.scale == "exp":
            return 2.0 / (math.exp(-epoch) + 1.0) - 1.0
        return float(self.scale)


def resolve_schedule(config: GQConfig) -> Tuple[int, float, Sequence[int], Sequence[float], float, float]:
    """Reproduce the hardcoded training schedules of reference main.py:136-157.

    Returns (epochs, base_lr, boundaries, lrs, momentum, weight_decay).
    ``boundaries[i]`` is the 1-based epoch at which lr becomes ``lrs[i]``.
    """
    momentum = config.momentum
    weight_decay = config.weight_decay
    base_lr = config.lr

    if config.dataset in ("mnist", "digits", "digits32"):
        epochs, boundaries, lrs = 20, (), ()
    elif config.dataset == "tinyimg":
        epochs, boundaries, lrs = 1000, (51,), (0.01,)
    else:
        epochs, boundaries, lrs = 150, (51, 71), (0.01, 0.005)

    if config.quantizer == "sign":
        # SignSGD hyperparameter override (reference main.py:149-157).
        epochs, boundaries, lrs = 150, (51, 71), (0.0005, 0.0001)
        base_lr = 1e-3
        momentum = 0.0
        weight_decay = 0.1

    return epochs, base_lr, boundaries, lrs, momentum, weight_decay


def lr_at_epoch(epoch: int, base_lr: float, boundaries: Sequence[int], lrs: Sequence[float]) -> float:
    """Piecewise-constant LR: the reference swaps the optimizer at boundary
    epochs (main.py:160-163); this returns the LR in effect at ``epoch`` (1-based)."""
    lr = base_lr
    for b, v in zip(boundaries, lrs):
        if epoch >= b:
            lr = v
    return lr


def wd_at_epoch(epoch: int, initial_wd: float, boundaries: Sequence[int]) -> float:
    """Reference quirk: every optimizer swap at an LR boundary re-hardcodes
    weight_decay=5e-4 (reference main.py:160-163) — including for SignSGD,
    whose wd=0.1 override (main.py:153) is silently replaced from the first
    boundary epoch onward."""
    for b in boundaries:
        if epoch >= b:
            return 5e-4
    return initial_wd
