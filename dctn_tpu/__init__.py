"""dctn-tpu: a TPU-native deep convolutional tensor-network framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of philip-bl/dctn
(arXiv:2005.14506): EPS (entangled-plaquette-state) patch contraction layers,
string-bond-state (ConvSBS) tensor-train layers, the quantum feature-map data
pipeline, empirical/theoretical unit-output-std initialization, and a pure-JAX
data-parallel training stack over a TPU device mesh.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):
  ops/       L1 kernel layer: windows, EPS, SBS/TT, rank-one stats, logmatmulexp
  data/      L2 data pipeline: feature maps, datasets, scaling, batching
  models/    L3 models: EPSes+linear, ConvSBS models
  train/     L4 training loop, evaluation, checkpointing, early stopping
  parallel/  device-mesh data parallelism (shard_map / pjit)
  cli/       L5 experiment runner and sweeps
  viz/       L6 log parsing and plotting
"""

__version__ = "0.1.0"
