"""Golden parity: our native T5 stacks vs HuggingFace transformers T5.

The reference builds its retrieval model from HF T5EncoderModel / T5Stack
(modules/model.py:77-96). Here we port randomly-initialized HF weights into
our flax stacks and require numerically identical outputs — the strongest
available evidence that the native reimplementation matches the
architecture the reference trains.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from rqvae_tpu.models.t5 import T5Stack, T5StackConfig

D_MODEL, D_KV, HEADS, D_FF, LAYERS = 32, 8, 4, 64, 2


def _hf_config(is_decoder):
    from transformers.models.t5.modeling_t5 import T5Config

    return T5Config(
        vocab_size=100,
        d_model=D_MODEL,
        d_kv=D_KV,
        num_heads=HEADS,
        d_ff=D_FF,
        num_layers=LAYERS,
        dropout_rate=0.0,
        is_decoder=is_decoder,
        is_encoder_decoder=False,
        use_cache=False,
    )


def _port_weights(hf_stack, is_decoder):
    """HF T5Stack state dict -> our flax params dict."""
    sd = {k: v.detach().numpy() for k, v in hf_stack.state_dict().items()}
    params = {}
    for i in range(LAYERS):
        blk = {}
        p = f"block.{i}.layer.0."
        blk["self_attn"] = {
            "q": {"kernel": sd[p + "SelfAttention.q.weight"].T},
            "k": {"kernel": sd[p + "SelfAttention.k.weight"].T},
            "v": {"kernel": sd[p + "SelfAttention.v.weight"].T},
            "o": {"kernel": sd[p + "SelfAttention.o.weight"].T},
        }
        if i == 0:
            blk["self_attn"]["rel_bias"] = sd[p + "SelfAttention.relative_attention_bias.weight"]
        blk["ln_self"] = {"weight": sd[p + "layer_norm.weight"]}
        li = 1
        if is_decoder:
            c = f"block.{i}.layer.1."
            blk["cross_attn"] = {
                "q": {"kernel": sd[c + "EncDecAttention.q.weight"].T},
                "k": {"kernel": sd[c + "EncDecAttention.k.weight"].T},
                "v": {"kernel": sd[c + "EncDecAttention.v.weight"].T},
                "o": {"kernel": sd[c + "EncDecAttention.o.weight"].T},
            }
            blk["ln_cross"] = {"weight": sd[c + "layer_norm.weight"]}
            li = 2
        f = f"block.{i}.layer.{li}."
        blk["ffn"] = {
            "wi": {"kernel": sd[f + "DenseReluDense.wi.weight"].T},
            "wo": {"kernel": sd[f + "DenseReluDense.wo.weight"].T},
        }
        blk["ln_ffn"] = {"weight": sd[f + "layer_norm.weight"]}
        params[f"block_{i}"] = blk
    params["ln_final"] = {"weight": sd["final_layer_norm.weight"]}
    return {"params": params}


class TestHFEncoderParity:
    def test_encoder_matches_hf(self):
        from transformers.models.t5.modeling_t5 import T5Stack as HFT5Stack

        torch.manual_seed(0)
        hf = HFT5Stack(_hf_config(is_decoder=False)).eval()
        x = torch.randn(2, 7, D_MODEL)
        mask = torch.ones(2, 7)
        mask[1, 4:] = 0
        with torch.no_grad():
            hf_out = hf(inputs_embeds=x, attention_mask=mask).last_hidden_state.numpy()

        cfg = T5StackConfig(
            d_model=D_MODEL, d_kv=D_KV, num_heads=HEADS, d_ff=D_FF, num_layers=LAYERS, dropout=0.0
        )
        ours = T5Stack(cfg, is_decoder=False)
        params = jax.tree_util.tree_map(jnp.asarray, _port_weights(hf, is_decoder=False))
        out = np.asarray(
            ours.apply(params, jnp.asarray(x.numpy()), self_mask=jnp.asarray(mask.numpy()))
        )
        # padded positions may differ (HF computes them; we don't care) —
        # compare valid positions only
        np.testing.assert_allclose(out[0], hf_out[0], atol=2e-5)
        np.testing.assert_allclose(out[1, :4], hf_out[1, :4], atol=2e-5)

    def test_decoder_matches_hf(self):
        from transformers.models.t5.modeling_t5 import T5Stack as HFT5Stack

        torch.manual_seed(1)
        hf = HFT5Stack(_hf_config(is_decoder=True)).eval()
        x = torch.randn(2, 5, D_MODEL)
        enc = torch.randn(2, 7, D_MODEL)
        enc_mask = torch.ones(2, 7)
        enc_mask[0, 5:] = 0
        with torch.no_grad():
            hf_out = hf(
                inputs_embeds=x,
                encoder_hidden_states=enc,
                encoder_attention_mask=enc_mask,
            ).last_hidden_state.numpy()

        cfg = T5StackConfig(
            d_model=D_MODEL, d_kv=D_KV, num_heads=HEADS, d_ff=D_FF, num_layers=LAYERS, dropout=0.0
        )
        ours = T5Stack(cfg, is_decoder=True)
        params = jax.tree_util.tree_map(jnp.asarray, _port_weights(hf, is_decoder=True))
        out = np.asarray(
            ours.apply(
                params,
                jnp.asarray(x.numpy()),
                enc_out=jnp.asarray(enc.numpy()),
                enc_mask=jnp.asarray(enc_mask.numpy()),
            )
        )
        np.testing.assert_allclose(out, hf_out, atol=2e-5)
