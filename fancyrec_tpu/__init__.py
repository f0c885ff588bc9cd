"""FancyRec-TPU: a TPU-native cross-modal brand-post retrieval framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the FancyRec
reference system (cross-modal brand <-> social-media-post retrieval for
brands): offline feature preprocessing, dual-branch multi-level visual/text
encoders fused into a common embedding space, rank-weighted contrastive
training, and full similarity-matrix retrieval evaluation -- all built for
TPU hardware (SPMD over device meshes, static shapes, masked vectorized
ops, bfloat16 matmuls on the MXU).

Layout:
  fancyrec_tpu.io          storage formats (BigFile, dict files, vocabularies)
  fancyrec_tpu.data        dataset parsing + host->device prefetch pipeline
  fancyrec_tpu.models      Flax modules (encoders, BERT, ResNet-152, fusion)
  fancyrec_tpu.losses      rank-weighted triplet / CrossCLR / queue-contrastive
  fancyrec_tpu.train       train state, jitted step, trainer CLI, checkpoints
  fancyrec_tpu.eval        metric kernels (JAX + numpy oracle), evaluator, tester CLI
  fancyrec_tpu.parallel    mesh construction, sharding rules, multi-host init
  fancyrec_tpu.ops         Pallas similarity kernel, streaming/distributed top-k
  fancyrec_tpu.preprocess  offline stage (frames, ResNet features, captions, packing)
  fancyrec_tpu.serving     persistent post indexes + brand -> top-k queries
  fancyrec_tpu.utils       fixture generator, meters, profiling hooks
"""

__version__ = "0.1.0"
