"""gqx — a TPU-native gradient-quantization training framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
xinyandai/gradient-quantization (reference layout documented in SURVEY.md):

- ``gqx.compress``   — the compressor family (QSGD, HSQ vector quantization,
  TernGrad, SignSGD, top-k / Maurey sparsification, residual VQ) as pure,
  jittable/vmappable functions with explicit PRNG keys.
- ``gqx.codebooks``  — fvecs codebook IO + on-device k-means generation.
- ``gqx.ops``        — Pallas TPU kernels (fused HSQ encode/decode, stochastic
  rounding) and the packed wire format (real bits-on-wire).
- ``gqx.parallel``   — quantized gradient aggregation: parameter-server and
  ring topologies, both as an on-chip simulated ``users`` axis (vmap/scan)
  and as real ``shard_map`` collectives over a device mesh.
- ``gqx.models``     — flax CIFAR ResNet/VGG/DenseNet + FCN/CNN, shape-matched
  to the reference (see models/ docstrings for file:line citations).
- ``gqx.data``       — dataset pipeline (raw-format parsers + synthetic).
- ``gqx.train``      — jitted multi-user training step, optax SGD, schedules.
"""

__version__ = "0.1.0"

from gqx.config import GQConfig  # noqa: F401
