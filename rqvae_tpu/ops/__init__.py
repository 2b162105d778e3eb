"""Numerics / ops layer: pure JAX functions with no model or data deps.

Reference-parity surface (citations into /root/reference):
- gumbel.py       <- distributions/gumbel.py
- losses.py       <- modules/loss.py
- normalize.py    <- modules/normalize.py
- kmeans.py       <- init/kmeans.py
- schedules.py    <- modules/scheduler/inv_sqrt.py, distributions/gumbel.py:23-43
- metrics.py      <- evaluate/metrics.py
- dedup.py        <- modules/tokenizer/semids.py:92-108 (sort-based, not O(N^2))
"""

from rqvae_tpu.ops.gumbel import (
    gumbel_softmax_sample,
    sample_gumbel,
    sample_without_replacement,
)
from rqvae_tpu.ops.normalize import l2norm
from rqvae_tpu.ops.losses import (
    reconstruction_loss,
    categorical_reconstruction_loss,
    quantize_loss,
)
from rqvae_tpu.ops.kmeans import kmeans
from rqvae_tpu.ops.schedules import inverse_sqrt_schedule, TemperatureScheduler
from rqvae_tpu.ops.metrics import TopKAccumulator, topk_hit_metrics
from rqvae_tpu.ops.dedup import pack_sem_id_tuples, dedup_counts, tuple_entropy
