#!/usr/bin/env python
"""Int8 (w8a8) feasibility probes for the fsrgan engine (VERDICT r2 #1).

Key hardware question: v5e's MXU contracts 2x deeper in int8, so i8 only
beats bf16 when K is large enough (K=32 expand is K-starved either way;
K=192 project / K=384 up2 / K=1152 final should approach 2x).  Also
measures the quantize/requantize elementwise overhead (extra VPU passes
over the 847 MB expanded activations could eat the win) and whether XLA
accepts i8 convs at all on this backend.

Timing per CLAUDE.md lessons: one program per variant, fori_loop of REPS
inside, rotating 2 distinct inputs, scalar fetch to force execution.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_int8_probe.py
       [--which matmul,conv,body]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def timeit(fn, xs, n=4, label="", reps=REPS):
    fetch = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(fetch(fn(xs[0])))
    t0 = time.time()
    for i in range(n):
        float(fetch(fn(xs[i % 2])))
    dt = (time.time() - t0) / n / reps * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt


# ------------------------------------------------------------- matmuls ----

def matmul_pair(M, K, N, key=0):
    """bf16 chain vs w8a8 chain (incl. requant overhead) at (M,K)@(K,N)."""
    rng = np.random.default_rng(key)
    w1 = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((N, K)) * 0.1, jnp.bfloat16)
    w1q = jnp.asarray(np.clip(np.round(np.asarray(w1, np.float32) / 0.01),
                              -127, 127), jnp.int8)
    w2q = jnp.asarray(np.clip(np.round(np.asarray(w2, np.float32) / 0.01),
                              -127, 127), jnp.int8)
    s = jnp.bfloat16(0.02)

    @jax.jit
    def bf16_chain(x):
        def step(i, z):
            y = jax.lax.dot(z, w1, precision=None,
                            preferred_element_type=jnp.bfloat16)
            z2 = jax.lax.dot(y, w2, preferred_element_type=jnp.bfloat16)
            return jnp.tanh(z2)          # keep bounded, all elements live
        return jax.lax.fori_loop(0, REPS, step, x)

    @jax.jit
    def i8_chain(x):
        def step(i, z):
            zq = jnp.clip(jnp.round(z.astype(jnp.float32) * 64.0),
                          -127, 127).astype(jnp.int8)
            y32 = jax.lax.dot(zq, w1q, preferred_element_type=jnp.int32)
            yq = jnp.clip(jnp.round(y32.astype(jnp.float32) * 1e-4),
                          -127, 127).astype(jnp.int8)
            z32 = jax.lax.dot(yq, w2q, preferred_element_type=jnp.int32)
            return jnp.tanh(z32.astype(jnp.bfloat16) * s)
        return jax.lax.fori_loop(0, REPS, step, x)

    xs = [jnp.asarray(np.random.default_rng(7 + i).standard_normal((M, K)),
                      jnp.bfloat16) for i in range(2)]
    gf = 2 * M * K * N / 1e9
    tb = timeit(bf16_chain, xs, label=f"bf16  M{M} K{K} N{N} ({2*gf:.1f} GF/it)")
    ti = timeit(i8_chain, xs, label=f"w8a8  M{M} K{K} N{N} (incl. requant)")
    print(f"   => i8/bf16 speed ratio {tb/ti:.2f}x   bf16 {2*gf/tb*1000/1e3:.1f} TF/s"
          f"   i8 {2*gf/ti*1000/1e3:.1f} Tops/s", flush=True)


# --------------------------------------------------------------- convs ----

def conv(x, w, groups=1, pet=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def conv_probe():
    """Does XLA accept/run i8 convs on this backend, and at what speed?"""
    N, H, W = 128, 139, 124
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-100, 100, (N, H, W, 192)), jnp.int8)
    w8_1x1 = jnp.asarray(rng.integers(-100, 100, (1, 1, 192, 32)), jnp.int8)
    w8_dw = jnp.asarray(rng.integers(-100, 100, (3, 3, 1, 192)), jnp.int8)

    for label, wq, groups in [("1x1 192->32 i8 conv", w8_1x1, 1),
                              ("3x3 dw@192 i8 conv", w8_dw, 192)]:
        try:
            @jax.jit
            def f(x, wq=wq, groups=groups):
                def step(i, z):
                    y = conv(z, wq, groups=groups, pet=jnp.int32)
                    return jnp.clip(y // 128, -127, 127).astype(jnp.int8) \
                        if groups == 1 else \
                        jnp.clip(y // 128, -127, 127).astype(jnp.int8)
                z = jax.lax.fori_loop(
                    0, REPS, lambda i, z: step(
                        i, z if groups > 1 else jnp.pad(
                            step(i, z), ((0, 0),) * 3 + ((0, 160),))), x)
                return z
            xs = [x8, jnp.asarray(rng.integers(-100, 100, x8.shape), jnp.int8)]
            timeit(f, xs, label=label)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED — {type(e).__name__}: {e}", flush=True)


# ---------------------------------------------------------------- body ----

def body_variants():
    """Full fsrgan body: bf16 vs w8a8 1x1s (dw stays bf16) vs w8a8 1x1s as
    dot_general.  Mirrors tools/exp_body_ops.py geometry."""
    N, H, W = 128, 139, 124
    rng = np.random.default_rng(0)

    def mk_w(k, cin, cout, key):
        return jnp.asarray(
            np.random.default_rng(key).standard_normal((k, k, cin, cout))
            * 0.3 / np.sqrt(k * k * cin), jnp.bfloat16)

    def mk_wq(w):
        wf = np.asarray(w, np.float32)
        sc = np.abs(wf).max(axis=(0, 1, 2)) / 127.0 + 1e-12
        return jnp.asarray(np.clip(np.round(wf / sc), -127, 127), jnp.int8), \
            jnp.asarray(sc, jnp.float32)

    ws = {}
    for blk in range(6):
        ws[f"e{blk}"] = mk_w(1, 32, 192, 10 + blk)
        ws[f"d{blk}"] = mk_w(3, 1, 192 if blk else 32, 20 + blk)
        ws[f"p{blk}"] = mk_w(1, 192 if blk else 32, 32, 30 + blk)
    ws["stem"] = mk_w(3, 3, 32, 1)
    ws["post"] = mk_w(3, 32, 32, 2)
    ws["fb"] = mk_w(1, 32, 3, 99)
    wq = {k: mk_wq(v) for k, v in ws.items() if k[0] in "ep"}

    def body_bf16(x):
        c1 = jnp.maximum(conv(x, ws["stem"]), 0)
        r = c1
        for blk in range(6):
            inp, h = r, r
            if blk:
                h = jnp.maximum(conv(h, ws[f"e{blk}"]), 0)
            h = jnp.maximum(conv(h, ws[f"d{blk}"], groups=h.shape[-1]), 0)
            if blk:
                h = conv(h, ws[f"p{blk}"])
                r = inp + h
            else:
                r = inp + conv(h, ws[f"p{blk}"])
        return conv(r, ws["post"]) + c1

    A_SCALE = 32.0  # static activation scale stand-in (calibrated in prod)

    def q(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32) * A_SCALE),
                        -127, 127).astype(jnp.int8)

    def body_i8(x, as_dot=False):
        c1 = jnp.maximum(conv(x, ws["stem"]), 0)
        r = c1
        for blk in range(6):
            inp, h = r, r
            if blk:
                w8, sc = wq[f"e{blk}"]
                hq = q(h)
                if as_dot:
                    y32 = jax.lax.dot_general(
                        hq.reshape(-1, 32), w8.reshape(32, 192),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32).reshape(
                            N, H, W, 192)
                else:
                    y32 = conv(hq, w8, pet=jnp.int32)
                h = jnp.maximum(
                    (y32.astype(jnp.float32) * (sc / A_SCALE))
                    .astype(jnp.bfloat16), 0)
            h = jnp.maximum(conv(h, ws[f"d{blk}"], groups=h.shape[-1]), 0)
            if blk:
                w8, sc = wq[f"p{blk}"]
                hq = q(h)
                if as_dot:
                    y32 = jax.lax.dot_general(
                        hq.reshape(-1, 192), w8.reshape(192, 32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32).reshape(
                            N, H, W, 32)
                else:
                    y32 = conv(hq, w8, pet=jnp.int32)
                h = (y32.astype(jnp.float32) * (sc / A_SCALE)) \
                    .astype(jnp.bfloat16)
                r = inp + h
            else:
                r = inp + conv(h, ws[f"p{blk}"])
        return conv(r, ws["post"]) + c1

    def chained(body):
        @jax.jit
        def fn(x):
            def step(i, z):
                y = body(z + jnp.bfloat16(i) * jnp.bfloat16(1e-6))
                return conv(y, ws["fb"])
            return jax.lax.fori_loop(0, REPS, step, x)
        return fn

    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((N, H, W, 3))
                      * 0.5, jnp.bfloat16) for i in range(2)]
    tb = timeit(chained(body_bf16), xs, label="body bf16 (chained)")
    try:
        ti = timeit(chained(lambda x: body_i8(x)), xs,
                    label="body w8a8 1x1 convs")
        print(f"   => conv-form i8 body {tb/ti:.2f}x vs bf16", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"body w8a8 conv-form FAILED — {type(e).__name__}: {e}",
              flush=True)
    try:
        td = timeit(chained(lambda x: body_i8(x, as_dot=True)), xs,
                    label="body w8a8 1x1 as dot_general")
        print(f"   => dot-form i8 body {tb/td:.2f}x vs bf16", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"body w8a8 dot-form FAILED — {type(e).__name__}: {e}",
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="matmul,conv,body")
    args = p.parse_args()
    which = args.which.split(",")
    if "matmul" in which:
        M = 131072
        for K, N in [(32, 192), (192, 32), (384, 128), (1152, 48),
                     (1152, 128)]:
            matmul_pair(M, K, N)
    if "conv" in which:
        conv_probe()
    if "body" in which:
        body_variants()


if __name__ == "__main__":
    main()
