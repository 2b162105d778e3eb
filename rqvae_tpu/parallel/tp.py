"""Tensor-parallel sharding rules for the retrieval model (GSPMD).

The reference has no TP (models are tiny; SURVEY.md §2.4) — under GSPMD it
is nearly free, so we provide Megatron-style rules for the transformer:
column-parallel first projections (q/k/v, wi), row-parallel second
projections (o, wo), vocab-sharded embedding and output heads. XLA inserts
the all-reduces over ICI.

Everything not matched is replicated; the 'data' axis shards batches only.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rqvae_tpu.parallel.mesh import MODEL_AXIS

_RULES = [
    # (path substring match, spec) — first match wins
    (("sid_embedding",), P(MODEL_AXIS, None)),
    (("user_embedding",), P(MODEL_AXIS, None)),
    (("heads",), P(None, None, MODEL_AXIS)),  # [L, d, K] -> shard K
    (("self_attn", "q"), P(None, MODEL_AXIS)),
    (("self_attn", "k"), P(None, MODEL_AXIS)),
    (("self_attn", "v"), P(None, MODEL_AXIS)),
    (("self_attn", "o"), P(MODEL_AXIS, None)),
    (("cross_attn", "q"), P(None, MODEL_AXIS)),
    (("cross_attn", "k"), P(None, MODEL_AXIS)),
    (("cross_attn", "v"), P(None, MODEL_AXIS)),
    (("cross_attn", "o"), P(MODEL_AXIS, None)),
    (("ffn", "wi"), P(None, MODEL_AXIS)),
    (("ffn", "wo"), P(MODEL_AXIS, None)),
]


def _path_names(path) -> tuple:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
    return tuple(names)


def retrieval_param_specs(params):
    """PartitionSpec pytree for EncoderDecoderRetrievalModel params."""

    def spec_for(path, leaf):
        names = _path_names(path)
        for needles, spec in _RULES:
            if all(any(n == needle for n in names) for needle in needles):
                if len(spec) == leaf.ndim:
                    return spec
                if leaf.ndim > len(spec):
                    # pad leading dims as replicated (e.g. scanned params)
                    return P(*([None] * (leaf.ndim - len(spec)) + list(spec)))
                # leaf has FEWER dims than the rule (e.g. a 1-D bias
                # matching a matmul rule): shard its trailing dims by the
                # rule's trailing entries rather than building an over-long
                # spec that device_put would reject
                return P(*list(spec)[len(spec) - leaf.ndim:])
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    specs = retrieval_param_specs(params)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )
