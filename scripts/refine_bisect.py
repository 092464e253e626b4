#!/usr/bin/env python
"""Bisect the metric3d refine stage (context conv + 4x ConvGRU + heads).

roofline_metric3d measured refine at 6.8 ms vs a 0.94 ms roof (13.8%).
Which sub-op eats it: the 3x3 convs themselves (N=128 MXU tiles), the
fp32 sigmoid/tanh casts, the concats, the tiny-N heads (delta 4ch /
conf 1ch / mask 441ch), or the fp32 pred carry? Each row is its own
compiled program over the 88x152 refinement grid; compare within the
table (same protocol as scripts/upsample_bisect.py)."""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark
from monocular_depth_estimation_trt_tpu.runtime.cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

b, h, w = 1, 88, 152
hidden = 128
k = 7
dt = jnp.bfloat16
rng = np.random.default_rng(0)


def dev(shape, dtype=np.float32):
    return jax.device_put(rng.standard_normal(shape).astype(dtype))


hx = dev((b, h, w, 2 * hidden)).astype(dt)
hh = dev((b, h, w, hidden)).astype(dt)
ctx = dev((b, h, w, 2 * hidden)).astype(dt)
pred = dev((b, h, w, 4))
w3_256_128 = (dev((3, 3, 2 * hidden, hidden)) * 0.02).astype(dt)
w3_256_256 = (dev((3, 3, 2 * hidden, 2 * hidden)) * 0.02).astype(dt)
w3_4_128 = (dev((3, 3, 4, hidden)) * 0.02).astype(dt)
w3_128_4 = (dev((3, 3, hidden, 4)) * 0.02).astype(dt)
w1_128_441 = (dev((1, 1, hidden, 9 * k * k)) * 0.02).astype(dt)


def conv(x, wk, stride=1):
    return jax.lax.conv_general_dilated(
        x, wk, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run(name, fn, args, iters=30):
    jfn = jax.jit(fn)
    jfn(*args)
    rep = benchmark(jfn, args,
                    config=BenchmarkConfig(warmup=3, iterations=iters),
                    name=name)
    print(f"{name:<30} {rep.avg_seconds * 1e3:8.3f} ms", flush=True)


# one 3x3 conv 256->128 (the GRU's unit of work), scanned x8 to amortize
def conv_scan8(x, wk):
    def body(c, _):
        y = conv(jnp.concatenate([c, c], axis=-1), wk)
        return y, None
    return jax.lax.scan(body, x[..., :hidden], None, length=8)[0]


run("conv3x3_256->128_scan8", conv_scan8, (hx, w3_256_128))


# the same but 256->256 fused-width (does doubling N help MXU util?)
def conv_scan8_wide(x, wk):
    def body(c, _):
        return conv(c, wk), None
    return jax.lax.scan(body, x, None, length=8)[0]


run("conv3x3_256->256_scan8", conv_scan8_wide, (hx, w3_256_256))


# full GRU iteration x4 (current unfused z/r form), fp32 gates
def gru4_unfused(h0, x, wz, wr, wq):
    def body(c, _):
        cx = jnp.concatenate([c, x], axis=-1)
        z = jax.nn.sigmoid(conv(cx, wz).astype(jnp.float32)).astype(dt)
        r = jax.nn.sigmoid(conv(cx, wr).astype(jnp.float32)).astype(dt)
        q = jnp.tanh(conv(jnp.concatenate([r * c, x], axis=-1),
                          wq).astype(jnp.float32)).astype(dt)
        return (1.0 - z) * c + z * q, None
    return jax.lax.scan(body, h0, None, length=4)[0]


run("gru_x4_unfused", gru4_unfused,
    (hh, hh, w3_256_128, w3_256_128, w3_256_128))


# fused z+r in one 256->256 conv
def gru4_fused(h0, x, wzr, wq):
    def body(c, _):
        cx = jnp.concatenate([c, x], axis=-1)
        zr = jax.nn.sigmoid(conv(cx, wzr).astype(jnp.float32)).astype(dt)
        z, r = zr[..., :hidden], zr[..., hidden:]
        q = jnp.tanh(conv(jnp.concatenate([r * c, x], axis=-1),
                          wq).astype(jnp.float32)).astype(dt)
        return (1.0 - z) * c + z * q, None
    return jax.lax.scan(body, h0, None, length=4)[0]


run("gru_x4_fused_zr", gru4_fused, (hh, hh, w3_256_256, w3_256_128))


# bf16 gates (no fp32 round-trip)
def gru4_bf16gates(h0, x, wzr, wq):
    def body(c, _):
        cx = jnp.concatenate([c, x], axis=-1)
        zr = jax.nn.sigmoid(conv(cx, wzr))
        z, r = zr[..., :hidden], zr[..., hidden:]
        q = jnp.tanh(conv(jnp.concatenate([r * c, x], axis=-1), wq))
        return (1.0 - z) * c + z * q, None
    return jax.lax.scan(body, h0, None, length=4)[0]


run("gru_x4_fused_bf16gates", gru4_bf16gates,
    (hh, hh, w3_256_256, w3_256_128))


# the tiny-N heads: pred_encoder 4->128, delta 128->4, mask 1x1 128->441
def heads(p, c, we, wd, wm):
    e = jax.nn.relu(conv(p.astype(dt), we))
    d = conv(c, wd).astype(jnp.float32)
    m = conv(c, wm)
    return e, d, m


run("heads(enc4->128,delta,mask)", heads,
    (pred, hh, w3_4_128, w3_128_4, w1_128_441))


# fp32 pred carry vs bf16 pred carry across 4 iterations
def pred_chain_fp32(p, c, we, wd):
    def body(pp, _):
        e = jax.nn.relu(conv(pp.astype(dt), we))
        return pp + conv(e, wd).astype(jnp.float32), None
    return jax.lax.scan(body, p, None, length=4)[0]


run("pred_chain_fp32_x4", pred_chain_fp32, (pred, hh, w3_4_128, w3_128_4))
