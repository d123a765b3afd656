"""acav100m_tpu — TPU-native (JAX/XLA/Pallas) rebuild of the ACAV100M
automatic audio-visual dataset-curation pipeline.

Reference capabilities: sangho-vision/acav100m (ICCV 2021).
The file-level contracts of the reference are preserved
(metadata.tsv -> filtered.tsv -> shard-*.tar/.json -> feature pkls ->
assignment pkls -> output.csv) while the runtime is a single JAX
single-controller program over a TPU mesh instead of per-GPU torch
processes.

Subpackages
-----------
config      nested config with dotted-key overrides (reference: */code/args.py)
utils       braceexpand, shard planning, run manifests, IO schemas
runtime     mesh bootstrap and sharding helpers (replaces mps/distributed.py)
data        host-side tar/shard datasets, decode and prefetch pipeline
ops         jitted compute cores: log-mel, k-means, MI measures, pallas kernels
models      flax models: VGGish, SlowFast, R3D/audio-ResNet, contrastive
pipeline    the six curation stage drivers
retrieval   correspondence-retrieval experiment harness
evaluation  pretraining + downstream linear evaluation
"""

__version__ = "0.1.0"
