"""mclstexp_tpu — a TPU-native (JAX/XLA/Pallas) framework for multimodal
contrastive spatial-transcriptomics expression prediction.

Re-designed from scratch with the capabilities of the reference system
(`ZhicengShi/mclSTExp`): a CLIP-style alignment of an H&E image-patch encoder
with a Transformer spot encoder over learnable (x, y) positional tables,
trained with a symmetric InfoNCE loss, and an inference path that predicts
spatial gene expression by top-K cosine retrieval + inverse-square-distance
aggregation over reference spot embeddings.

Layering (TPU-first, not a translation):
  core/      pure-function math: transformer blocks, projection heads, losses
  ops/       XLA/Pallas compute kernels: retrieval, patch extraction, augment
  models/    image encoders (DenseNet/ResNet/ViT in flax) + spot encoder
  data/      dataset ingestion (ST/Visium), normalization, HVG, pipelines
  parallel/  jax.sharding Mesh utilities, dp/tp layouts
  train/     jitted train step, fold driver, Orbax checkpointing
  infer/     embedding dump, leave-one-out retrieval eval, metrics
  cli/       hvg / train / eval / predict subcommands
"""

__version__ = "0.1.0"

from mclstexp_tpu import config as config  # noqa: F401
