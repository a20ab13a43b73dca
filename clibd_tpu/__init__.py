"""clibd_tpu — TPU-native tri-modal contrastive learning framework.

A brand-new JAX/XLA/pjit/Pallas implementation of the capabilities of
bioscan-ml/clibd (CLIBD / BIOSCAN-CLIP, ICLR 2025): aligning image
(ViT-B/16), DNA barcode (BarcodeBERT) and taxonomic text (BERT-small)
encoders in one embedding space via pairwise multi-positive InfoNCE,
with retrieval-based taxonomic classification.

Design: pure-functional pytree models, jit-compiled train/eval steps
sharded over a `jax.sharding.Mesh`, on-device matmul+top-k retrieval
(replacing FAISS), and a prefetched host input pipeline feeding
fixed-shape device batches.
"""

__version__ = "0.1.0"
