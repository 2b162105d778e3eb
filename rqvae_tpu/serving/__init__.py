"""Serving layer: corpus trie, retriever, bucketed engine, async queue.

Exports resolve lazily (PEP 562): models/retrieval.py imports
rqvae_tpu.serving.beam, so eager re-exports of Retriever/engine here would
close an import cycle back through the model package.
"""

_EXPORTS = {
    "PrefixTable": "rqvae_tpu.serving.beam",
    "build_prefix_table": "rqvae_tpu.serving.beam",
    "extend_prefix_table": "rqvae_tpu.serving.beam",
    "RetrievalEngine": "rqvae_tpu.serving.engine",
    "AsyncRetrievalEngine": "rqvae_tpu.serving.queue",
    "RetrievalResult": "rqvae_tpu.serving.retriever",
    "Retriever": "rqvae_tpu.serving.retriever",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
