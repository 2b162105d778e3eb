"""rqvae_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
TIGER-style generative semantic-ID retrieval.

Capabilities mirror the reference PyTorch implementation
(EdoardoBotta/RQ-VAE-Recommender), re-designed TPU-first:

- Stage 1: an RQ-VAE tokenizer (MLP encoder/decoder + residual quantization
  against L codebooks, with Gumbel-softmax / straight-through / rotation-trick
  gradient estimators and K-means codebook init) maps item content embeddings
  to tuples of semantic IDs.  (reference: modules/rqvae.py, modules/quantize.py)
- Index build: full-corpus tokenization into a deduplicated semantic-ID table.
  (reference: modules/tokenizer/semids.py)
- Stage 2: a natively implemented T5-style encoder-decoder is trained to
  generate the next item's semantic-ID tuple from a user's tokenized history.
  (reference: modules/model.py)
- Serving: jit-compiled, fixed-shape constrained beam search over the corpus
  prefix trie. (reference: modules/model.py:300-410)

Everything on the compute path is pure-functional JAX compiled by XLA, with
Pallas kernels for the hot loops and GSPMD (`jax.sharding` + `jit`) for
multi-chip data/model parallelism.
"""

__version__ = "0.1.0"
