"""Hardware probe: the window-mode paged-attention kernel must compile under
Mosaic and match the XLA stacked oracle at 8B-class shapes (HD=128, int8
pools, page 32).  Run on the real chip; interpret-mode tests can pass while
Mosaic rejects the lowering (CLAUDE.md)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from llama3np_tpu.ops import core as ops
from llama3np_tpu.ops.kernels.paged_attention import paged_attention as kernel

rng = np.random.default_rng(0)


def run(dt, quant, Q):
    NL, B, P, maxp = 2, 4, 40, 8
    nh, kvh, hd, page = 32, 8, 128, 32
    li = 1
    q = jnp.asarray(rng.standard_normal((B, 1, nh, hd)), jnp.bfloat16)
    kp = rng.standard_normal((NL, P, kvh, page, hd)).astype(np.float32)
    vp = rng.standard_normal((NL, P, kvh, page, hd)).astype(np.float32)
    wk = rng.standard_normal((B, kvh, Q, hd)).astype(np.float32)
    wv = rng.standard_normal((B, kvh, Q, hd)).astype(np.float32)
    ck = rng.standard_normal((B, kvh, hd)).astype(np.float32)
    cv = rng.standard_normal((B, kvh, hd)).astype(np.float32)
    bt = rng.permutation(np.arange(1, P))[: B * maxp].reshape(B, maxp).astype(np.int32)
    pos = np.array([0, page + 3, 100, maxp * page - Q], np.int32)

    scales = {}
    if quant:
        def qz(x):
            qv, s = ops.quantize_kv_rows(jnp.asarray(x))
            return np.asarray(qv), np.asarray(s)
        kp, kps = qz(kp); vp, vps = qz(vp)
        wk, wks = qz(wk); wv, wvs = qz(wv)
        ck, cks = qz(ck); cv, cvs = qz(cv)
        scales = dict(kps=jnp.asarray(kps), vps=jnp.asarray(vps),
                      wks=jnp.asarray(wks), wvs=jnp.asarray(wvs),
                      cks=jnp.asarray(cks), cvs=jnp.asarray(cvs))
    else:
        kp = kp.astype(dt); vp = vp.astype(dt)
        wk = wk.astype(dt); wv = wv.astype(dt)
        ck = ck.astype(dt); cv = cv.astype(dt)

    @jax.jit
    def both(q, kp, vp, bt, pos, ck, cv, wk, wv, wc, scales):
        kw_k = dict(k_scale_rows=None, v_scale_rows=None, cur_ks=None,
                    cur_vs=None, win_ks=None, win_vs=None)
        kw_o = dict(k_scale_pool=None, v_scale_pool=None, cur_ks=None,
                    cur_vs=None, win_ks=None, win_vs=None)
        if scales:
            kw_k = dict(
                k_scale_rows=ops.gather_page_scales_stacked(
                    scales["kps"], li, bt),
                v_scale_rows=ops.gather_page_scales_stacked(
                    scales["vps"], li, bt),
                cur_ks=scales["cks"], cur_vs=scales["cvs"],
                win_ks=scales["wks"], win_vs=scales["wvs"])
            kw_o = dict(k_scale_pool=scales["kps"], v_scale_pool=scales["vps"],
                        cur_ks=scales["cks"], cur_vs=scales["cvs"],
                        win_ks=scales["wks"], win_vs=scales["wvs"])
        got = kernel(q, kp, vp, bt, pos, layer=li, cur_k=ck, cur_v=cv,
                     win_k=wk, win_v=wv, win_count=wc, **kw_k)
        want = ops.paged_attention_stacked(
            q, kp, vp, li, bt, pos, cur_k=ck, cur_v=cv,
            win_k=wk, win_v=wv, win_count=wc, **kw_o)
        return got, want

    for wc in (0, 1, Q - 1):
        t0 = time.time()
        got, want = both(q, jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(bt),
                         jnp.asarray(pos), jnp.asarray(ck), jnp.asarray(cv),
                         jnp.asarray(wk), jnp.asarray(wv), jnp.int32(wc),
                         scales)
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        err = np.max(np.abs(got - want))
        print(f"dt={dt} quant={quant} Q={Q} wc={wc}: max|err|={err:.2e} "
              f"({time.time()-t0:.1f}s)", flush=True)
        assert err < 3e-2, (dt, quant, Q, wc, err)


for spec in sys.argv[1:] or ["bf16-8", "bf16-16", "int8-8"]:
    dt, Q = spec.split("-")
    run("bfloat16" if dt == "bf16" else None, dt == "int8", int(Q))
print("OK", flush=True)
