"""segtpu — TPU-native NAS semantic-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``DrSleep/nas-segm-pytorch`` (CVPR'19 arXiv:1810.10804, WACV'20
arXiv:1904.02365): MobileNet-v2 encoder, NAS micro-decoder cells
materialized from genotypes, a fused single-XLA-program inference engine
(uint8 image in -> uint8 mask out), an RL (REINFORCE/PPO) architecture
search loop with auxiliary cells, and a multi-device search/training
harness over a ``jax.sharding.Mesh``.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  core/     NHWC functional primitives (conv/BN/act, exact bilinear resize)
  ops/      the NAS op vocabulary (reference: src/nn/layer_factory.py)
  models/   encoder + micro-decoder + segmenter (reference: src/nn/)
  engine/   fused inference + jitted train steps (reference: src/engine/)
  rl/       LSTM controller + policy-gradient agent (reference: src/rl/)
  data/     .lst manifest datasets + transforms (reference: src/data/)
  utils/    metrics (jitted confusion-matrix mIoU), solvers, helpers
  parallel/ mesh construction + sharded train steps (XLA collectives, ICI)
  convert/  PyTorch checkpoint -> JAX pytree importer (parity anchor)
  kernels/  Pallas TPU kernels for the fused hot paths
"""

__version__ = "0.1.0"
