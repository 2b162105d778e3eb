"""Minimal on-chip repros for the decoder-stack kernel's Mosaic crash
(vector_extract_rule CHECK limits[i] <= dim(i)). Each case compiles one
tiny kernel exercising ONE suspect pattern; run them to bisect which
lowering breaks. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mosaic_repro.py [case ...]
"""

import sys

sys.path.insert(0, "/root/repo")

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB, KT, D, DK, NL, H, LE = 8, 30, 384, 64, 4, 6, 61


def call(kernel, out_shape, *args):
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
    f = pl.pallas_call(
        kernel,
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    return np.asarray(jax.jit(f)(*args))


def case_wslice():
    """ds-slice a [NL*? no — [NL, H, d, dk] weight ref at static (l, h)."""
    w = jnp.ones((NL, H, D, DK), jnp.bfloat16)
    x = jnp.ones((BB * KT, D), jnp.bfloat16)

    def k(x_ref, w_ref, o_ref):
        acc = jnp.zeros((BB * KT, DK), jnp.float32)
        for l in range(NL):
            for h in range(H):
                wlh = w_ref[pl.ds(l, 1), pl.ds(h, 1)].reshape(D, DK)
                acc += jnp.dot(x_ref[...], wlh, preferred_element_type=jnp.float32)
        o_ref[...] = acc

    out = call(k, jax.ShapeDtypeStruct((BB * KT, DK), jnp.float32), x, w)
    assert np.allclose(out, D * NL * H), out[0, 0]


def case_reshape3d():
    """[M, dk] -> [bb, kt, dk] -> batched dot -> [M, dk] with kt=30."""
    x = jnp.ones((BB * KT, DK), jnp.bfloat16)

    def k(x_ref, o_ref):
        q3 = x_ref[...].reshape(BB, KT, DK)
        s = jax.lax.dot_general(
            q3, q3, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        oh = jax.lax.dot_general(
            p, q3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[...] = oh.reshape(BB * KT, DK)

    out = call(k, jax.ShapeDtypeStruct((BB * KT, DK), jnp.float32), x)
    assert np.isfinite(out).all()


def case_reshape3d_kt1():
    """Same with kt=1 (the level-0 shape)."""
    x = jnp.ones((BB * 1, DK), jnp.bfloat16)

    def k(x_ref, o_ref):
        q3 = x_ref[...].reshape(BB, 1, DK)
        s = jax.lax.dot_general(
            q3, q3, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        oh = jax.lax.dot_general(
            p, q3, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[...] = oh.reshape(BB, DK)

    out = call(k, jax.ShapeDtypeStruct((BB, DK), jnp.float32), x)
    assert np.isfinite(out).all()


def case_reshape_d():
    """[M, d] <-> [bb, kt, d] residual roundtrip with kt=30."""
    x = jnp.ones((BB, KT, D), jnp.bfloat16)

    def k(x_ref, o_ref):
        x2 = x_ref[...].reshape(BB * KT, D)
        y = x2 * 2.0
        o_ref[...] = x_ref[...] + y.reshape(BB, KT, D).astype(jnp.bfloat16)

    out = call(k, jax.ShapeDtypeStruct((BB, KT, D), jnp.bfloat16), x)
    assert np.allclose(out, 3.0)


def case_kc5d():
    """5-D cross-K/V ref sliced at (l, :, h)."""
    kc = jnp.ones((NL, BB, H, LE, DK), jnp.bfloat16)
    q = jnp.ones((BB, KT, DK), jnp.bfloat16)

    def k(q_ref, kc_ref, o_ref):
        acc = jnp.zeros((BB, KT, LE), jnp.float32)
        for l in range(NL):
            for h in range(H):
                kch = kc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(BB, LE, DK)
                acc += jax.lax.dot_general(
                    q_ref[...], kch, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
        o_ref[...] = acc

    out = call(k, jax.ShapeDtypeStruct((BB, KT, LE), jnp.float32), q, kc)
    assert np.allclose(out, DK * NL * H)


def case_bias_small():
    """[H, kt, kt] bias ref sliced per head at kt=1 and kt=3."""
    for kt in (1, 3):
        b = jnp.arange(H * kt * kt, dtype=jnp.float32).reshape(H, kt, kt)
        s = jnp.zeros((BB, kt, kt), jnp.float32)

        def k(s_ref, b_ref, o_ref):
            acc = jnp.zeros(s_ref.shape, jnp.float32)
            for h in range(H):
                acc += s_ref[...] + b_ref[pl.ds(h, 1)]
            o_ref[...] = acc

        out = call(k, jax.ShapeDtypeStruct((BB, kt, kt), jnp.float32), s, b)
        want = np.asarray(b).sum(0)[None]
        assert np.allclose(out, want), (kt, out[0], want)


def case_ln_slice():
    """[NL, d] norm-scale ref ds-sliced per layer."""
    w = jnp.ones((NL, D), jnp.float32) * 2.0
    x = jnp.ones((BB * KT, D), jnp.float32)

    def k(x_ref, w_ref, o_ref):
        acc = jnp.zeros((BB * KT, D), jnp.float32)
        for l in range(NL):
            acc += x_ref[...] * w_ref[pl.ds(l, 1)]
        o_ref[...] = acc

    out = call(k, jax.ShapeDtypeStruct((BB * KT, D), jnp.float32), x, w)
    assert np.allclose(out, 2.0 * NL)


CASES = {
    "wslice": case_wslice,
    "reshape3d": case_reshape3d,
    "reshape3d_kt1": case_reshape3d_kt1,
    "reshape_d": case_reshape_d,
    "kc5d": case_kc5d,
    "bias_small": case_bias_small,
    "ln_slice": case_ln_slice,
}



def case_full(parts="scf"):
    """The real t5_decoder_stack_infer call at the Amazon level-2 shape.
    parts: subset of 's' (self-attn), 'c' (cross), 'f' (ffn) to keep —
    monkeypatches the kernel module to skip the others for bisecting."""
    import rqvae_tpu.ops.pallas.decoder_stack as ds

    NLH = (NL, H)
    r = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    cdt = jnp.bfloat16
    kt8 = 32
    x = f(64, kt8, D).astype(cdt)
    wq, wk, wv = (f(NL, H, D, DK).astype(cdt) for _ in range(3))
    wo = f(NL, H, DK, D).astype(cdt)
    cq = f(NL, H, D, DK).astype(cdt)
    co = f(NL, H, DK, D).astype(cdt)
    wi = f(NL, D, 1024).astype(cdt)
    wo2 = f(NL, 1024, D).astype(cdt)
    ln_s, ln_c, ln_f = f(NL, D), f(NL, D), f(NL, D)
    ln_fin = f(1, D)
    bias = f(H, kt8, kt8)
    kc = f(NL, 64, H, LE, DK).astype(cdt)
    vc = f(NL, 64, H, LE, DK).astype(cdt)
    em = jnp.zeros((64, kt8, LE), jnp.float32)  # pre-broadcast additive mask

    orig = ds._kernel
    if parts != "scf":
        def patched(num_layers, heads, eps, *refs):
            return _partial_kernel(parts, num_layers, heads, eps, *refs)

        ds._kernel = patched
    try:
        run = jax.jit(lambda *a: ds.t5_decoder_stack_infer(*a, eps=1e-6))
        out = np.asarray(run(
            x, wq, wk, wv, wo, cq, co, wi, wo2, ln_s, ln_c, ln_f, ln_fin,
            bias, kc, vc, em,
        ))
    finally:
        ds._kernel = orig
    assert np.isfinite(out).all()
    print("full out ok", out.shape)


def _partial_kernel(parts, num_layers, heads, eps,
                    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, cq_ref, co_ref,
                    wi_ref, wo2_ref, lns_ref, lnc_ref, lnf_ref, lnfin_ref,
                    bias_ref, kc_ref, vc_ref, mask_ref, o_ref):
    import rqvae_tpu.ops.pallas.decoder_stack as ds
    from jax.experimental import pallas as pl

    bb, kt, d = x_ref.shape
    dk = wq_ref.shape[-1]
    le = kc_ref.shape[-2]
    cdt = x_ref.dtype
    x = x_ref[...]
    mterm = mask_ref[...]  # [bb, kT, Le] f32 additive (pre-broadcast)

    def w2(ref, l, h):
        return ref[pl.ds(l, 1), pl.ds(h, 1)].reshape(ref.shape[2], ref.shape[3])

    def bdot(a, b, contract_b=2):
        return jax.lax.dot_general(
            a, b, (((2,), (contract_b,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    for l in range(num_layers):
        if "s" in parts:
            xn = ds._rmsnorm(x.reshape(bb * kt, d), lns_ref[pl.ds(l, 1)], eps).astype(cdt)
            attn = jnp.zeros((bb * kt, d), jnp.float32)
            for h in range(heads):
                bias_h = bias_ref[pl.ds(h, 1)]
                q3 = jnp.dot(xn, w2(wq_ref, l, h), preferred_element_type=jnp.float32).astype(cdt).reshape(bb, kt, dk)
                k3 = jnp.dot(xn, w2(wk_ref, l, h), preferred_element_type=jnp.float32).astype(cdt).reshape(bb, kt, dk)
                v3 = jnp.dot(xn, w2(wv_ref, l, h), preferred_element_type=jnp.float32).astype(cdt).reshape(bb, kt, dk)
                s = bdot(q3, k3) + bias_h
                p = jax.nn.softmax(s, axis=-1).astype(cdt)
                oh = bdot(p, v3, contract_b=1).astype(cdt)
                attn = attn + jnp.dot(oh.reshape(bb * kt, dk), w2(wo_ref, l, h), preferred_element_type=jnp.float32)
            x = x + attn.astype(cdt).reshape(bb, kt, d)
        if "c" in parts:
            xn = ds._rmsnorm(x.reshape(bb * kt, d), lnc_ref[pl.ds(l, 1)], eps).astype(cdt)
            catt = jnp.zeros((bb * kt, d), jnp.float32)
            for h in range(heads):
                kch = kc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(bb, le, dk)
                vch = vc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(bb, le, dk)
                q3 = jnp.dot(xn, w2(cq_ref, l, h), preferred_element_type=jnp.float32).astype(cdt).reshape(bb, kt, dk)
                s = bdot(q3, kch) + mterm
                p = jax.nn.softmax(s, axis=-1).astype(cdt)
                oh = bdot(p, vch, contract_b=1).astype(cdt)
                catt = catt + jnp.dot(oh.reshape(bb * kt, dk), w2(co_ref, l, h), preferred_element_type=jnp.float32)
            x = x + catt.astype(cdt).reshape(bb, kt, d)
        if "f" in parts:
            xn = ds._rmsnorm(x.reshape(bb * kt, d), lnf_ref[pl.ds(l, 1)], eps).astype(cdt)
            wi_l = wi_ref[pl.ds(l, 1)].reshape(wi_ref.shape[1], wi_ref.shape[2])
            wo2_l = wo2_ref[pl.ds(l, 1)].reshape(wo2_ref.shape[1], wo2_ref.shape[2])
            hf = jax.nn.relu(jnp.dot(xn, wi_l, preferred_element_type=jnp.float32).astype(cdt))
            ff = jnp.dot(hf, wo2_l, preferred_element_type=jnp.float32).astype(cdt)
            x = x + ff.reshape(bb, kt, d)

    y = ds._rmsnorm(x.reshape(bb * kt, d), lnfin_ref[pl.ds(0, 1)], eps)
    o_ref[...] = y.astype(jnp.float32).reshape(bb, kt, d)


CASES["full"] = case_full
CASES["full_s"] = lambda: case_full("s")
CASES["full_c"] = lambda: case_full("c")
CASES["full_f"] = lambda: case_full("f")



def _kc_grid(ndim):
    """Cross-attention pattern under a real grid: kc as 5-D [NL,B,H,le,dk]
    blocks (ndim=5) vs (NL,H)-folded 4-D [NL*H,B,le,dk] blocks (ndim=4)."""
    B, bb = 64, 32
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, KT, DK).astype(np.float32)).astype(jnp.bfloat16)
    em = jnp.ones((B, 1, LE), jnp.int32)
    if ndim == 5:
        kc = jnp.ones((NL, B, H, LE, DK), jnp.bfloat16)
        kvspec = pl.BlockSpec((NL, bb, H, LE, DK), lambda b: (0, b, 0, 0, 0), memory_space=pltpu.VMEM)
        sl = lambda ref, l, h: ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(bb, LE, DK)
    else:
        kc = jnp.ones((NL * H, B, LE, DK), jnp.bfloat16)
        kvspec = pl.BlockSpec((NL * H, bb, LE, DK), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM)
        sl = lambda ref, l, h: ref[pl.ds(l * H + h, 1)].reshape(bb, LE, DK)

    def k(q_ref, kc_ref, m_ref, o_ref):
        mterm = jnp.where(m_ref[...] != 0, 0.0, -1e9)
        acc = jnp.zeros((bb, KT, DK), jnp.float32)
        for l in range(NL):
            for h in range(H):
                kch = sl(kc_ref, l, h)
                s = jax.lax.dot_general(
                    q_ref[...], kch, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) + mterm
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                acc += jax.lax.dot_general(
                    p, kch, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
        o_ref[...] = acc

    qspec = pl.BlockSpec((bb, KT, DK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((bb, 1, LE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        k,
        grid=(B // bb,),
        in_specs=[qspec, kvspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, KT, DK), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q, kc, em)
    out = np.asarray(out)
    assert np.isfinite(out).all()


CASES["kc5d_grid"] = lambda: _kc_grid(5)
CASES["kc4d_grid"] = lambda: _kc_grid(4)



def _kc_var(grid=False, mask=False, pv=True):
    B = 64 if grid else BB
    bb = 32 if grid else BB
    q = jnp.ones((B, KT, DK), jnp.bfloat16)
    em = jnp.ones((B, 1, LE), jnp.int32)
    kc = jnp.ones((NL, B, H, LE, DK), jnp.bfloat16)

    def k(q_ref, kc_ref, m_ref, o_ref):
        acc = jnp.zeros((bb, KT, DK if pv else LE), jnp.float32)
        for l in range(NL):
            for h in range(H):
                kch = kc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(bb, LE, DK)
                s = jax.lax.dot_general(
                    q_ref[...], kch, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                if mask:
                    s = s + jnp.where(m_ref[...] != 0, 0.0, -1e9)
                p = jax.nn.softmax(s, axis=-1)
                if pv:
                    acc += jax.lax.dot_general(
                        p.astype(jnp.bfloat16), kch, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    acc += p
        o_ref[...] = acc

    if grid:
        qspec = pl.BlockSpec((bb, KT, DK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((NL, bb, H, LE, DK), lambda b: (0, b, 0, 0, 0), memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((bb, 1, LE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((bb, KT, DK if pv else LE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            k, grid=(B // bb,), in_specs=[qspec, kvspec, mspec], out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, KT, DK if pv else LE), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(q, kc, em)
    else:
        out = call(k, jax.ShapeDtypeStruct((B, KT, DK if pv else LE), jnp.float32), q, kc, em)
    assert np.isfinite(np.asarray(out)).all()


CASES["kc_nogrid_mask"] = lambda: _kc_var(grid=False, mask=True)
CASES["kc_grid_nomask"] = lambda: _kc_var(grid=True, mask=False)
CASES["kc_nogrid_pv"] = lambda: _kc_var(grid=False, mask=False)



def case_kc_mask2():
    """mask via the attention kernel's proven idiom: mask_ref[:, 0] then
    [:, None, :] (vs reading the [bb,1,le] block directly)."""
    q = jnp.ones((BB, KT, DK), jnp.bfloat16)
    em = jnp.ones((BB, 1, LE), jnp.int32)
    kc = jnp.ones((NL, BB, H, LE, DK), jnp.bfloat16)

    def k(q_ref, kc_ref, m_ref, o_ref):
        m2 = m_ref[:, 0]  # [bb, le]
        acc = jnp.zeros((BB, KT, DK), jnp.float32)
        for l in range(NL):
            for h in range(H):
                kch = kc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(BB, LE, DK)
                s = jax.lax.dot_general(
                    q_ref[...], kch, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                s = s + jnp.where(m2[:, None, :] != 0, 0.0, -1e9)
                p = jax.nn.softmax(s, axis=-1)
                acc += jax.lax.dot_general(
                    p.astype(jnp.bfloat16), kch, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
        o_ref[...] = acc

    out = call(k, jax.ShapeDtypeStruct((BB, KT, DK), jnp.float32), q, kc, em)
    assert np.isfinite(np.asarray(out)).all()


CASES["kc_mask2"] = case_kc_mask2



def _kc_maskfix(variant):
    q = jnp.ones((BB, KT, DK), jnp.bfloat16)
    kc = jnp.ones((NL, BB, H, LE, DK), jnp.bfloat16)
    if variant == "prebroadcast":
        em = jnp.ones((BB, KT, LE), jnp.int32)
    else:
        em = jnp.ones((BB, 1, LE), jnp.int32)

    def k(q_ref, kc_ref, m_ref, o_ref):
        if variant == "materialize":
            m3 = jnp.broadcast_to(m_ref[...], (BB, KT, LE))
            mterm = jnp.where(m3 != 0, 0.0, -1e9)
        elif variant == "addzeros":
            mterm = jnp.zeros((BB, KT, LE), jnp.float32) + jnp.where(
                m_ref[...] != 0, 0.0, -1e9
            )
        else:  # prebroadcast
            mterm = jnp.where(m_ref[...] != 0, 0.0, -1e9)
        acc = jnp.zeros((BB, KT, DK), jnp.float32)
        for l in range(NL):
            for h in range(H):
                kch = kc_ref[pl.ds(l, 1), :, pl.ds(h, 1)].reshape(BB, LE, DK)
                s = jax.lax.dot_general(
                    q_ref[...], kch, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) + mterm
                p = jax.nn.softmax(s, axis=-1)
                acc += jax.lax.dot_general(
                    p.astype(jnp.bfloat16), kch, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
        o_ref[...] = acc

    out = call(k, jax.ShapeDtypeStruct((BB, KT, DK), jnp.float32), q, kc, em)
    assert np.isfinite(np.asarray(out)).all()


CASES["kc_mask_materialize"] = lambda: _kc_maskfix("materialize")
CASES["kc_mask_addzeros"] = lambda: _kc_maskfix("addzeros")
CASES["kc_mask_prebroadcast"] = lambda: _kc_maskfix("prebroadcast")



def case_enc_full(L=808, B=16):
    """The real t5_encoder_stack_infer call at the (padded) ML-32M shape."""
    from rqvae_tpu.ops.pallas.encoder_stack import t5_encoder_stack_infer

    r = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    cdt = jnp.bfloat16
    x = (f(B, L, D) * 0.1).astype(cdt)
    wq, wk, wv = (f(NL, H, D, DK).astype(cdt) * 0.05 for _ in range(3))
    wo = f(NL, H, DK, D).astype(cdt) * 0.05
    wi = f(NL, D, 1024).astype(cdt) * 0.05
    wo2 = f(NL, 1024, D).astype(cdt) * 0.05
    ln_s, ln_f = jnp.abs(f(NL, D)), jnp.abs(f(NL, D))
    ln_fin = jnp.abs(f(1, D))
    bias = f(H, L, L)
    mask = jnp.where(jnp.asarray(r.rand(B, 1, L) > 0.2), 0.0, -1e9).astype(jnp.float32)

    run = jax.jit(lambda *a: t5_encoder_stack_infer(*a, eps=1e-6))
    out = np.asarray(run(x, wq, wk, wv, wo, wi, wo2, ln_s, ln_f, ln_fin, bias, mask))
    assert np.isfinite(out).all()
    print("enc_full out ok", out.shape)


CASES["enc_full"] = case_enc_full
CASES["enc_full_short"] = lambda: case_enc_full(L=88, B=64)



def case_mask_outer():
    """Rank-1 batched-matmul mask materialization under a grid (the
    encoder kernel's idiom: ones[bb,L,1] @ m[bb,1,L] -> [bb,L,L])."""
    B, bb, L = 16, 8, 88
    m = jnp.where(jnp.ones((B, 1, L)) > 0, 0.0, -1e9).astype(jnp.float32)
    q = jnp.ones((B, L, DK), jnp.bfloat16)

    def k(q_ref, m_ref, o_ref):
        mterm = jax.lax.dot_general(
            jnp.ones((bb, L, 1), jnp.float32), m_ref[...],
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )
        s = jax.lax.dot_general(
            q_ref[...], q_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + mterm
        o_ref[...] = jax.nn.softmax(s, axis=-1)

    qspec = pl.BlockSpec((bb, L, DK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((bb, 1, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bb, L, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        k, grid=(B // bb,), in_specs=[qspec, mspec], out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, L, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q, m)
    assert np.isfinite(np.asarray(out)).all()


CASES["mask_outer"] = case_mask_outer


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for n in names:
        print(f"--- {n} ---", flush=True)
        try:
            CASES[n]()
            print(f"{n}: OK", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{n}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

