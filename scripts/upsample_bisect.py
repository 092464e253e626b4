#!/usr/bin/env python
"""Bisect the metric3d convex-upsample stage into sub-ops (TPU).

Which of: 9-tap softmax (unaligned 49-lane slices), weighted accumulation,
pixel-shuffle transpose, fp32 activations — eats the ~7.6 ms?"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark
from monocular_depth_estimation_trt_tpu.runtime.cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

b, h, w, c, k = 1, 88, 152, 5, 7
kk = k * k
dt = jnp.bfloat16
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(dt)
mask = jax.device_put(
    rng.standard_normal((b, h, w, 9 * kk)).astype(np.float32)).astype(dt)
wts = [jax.device_put(
    rng.standard_normal((b, h, w, kk)).astype(np.float32)).astype(dt)
    for _ in range(9)]
acc = jax.device_put(
    rng.standard_normal((b, h, w, kk)).astype(np.float32)).astype(dt)
up5 = jax.device_put(
    rng.standard_normal((b, k * h, k * w, c)).astype(np.float32))


def run(name, fn, args):
    jfn = jax.jit(fn)
    jfn(*args)
    rep = benchmark(jfn, args, config=BenchmarkConfig(warmup=3, iterations=20),
                    name=name)
    print(f"{name:<28} {rep.avg_seconds*1e3:8.3f} ms", flush=True)


def softmax_sliced(mask):
    taps = [mask[..., j * kk:(j + 1) * kk] for j in range(9)]
    mx = functools.reduce(jnp.maximum, taps)
    exps = [jnp.exp(t - mx) for t in taps]
    den = functools.reduce(jnp.add, exps)
    return [e / den for e in exps]


def softmax_5d(mask):
    m = mask.reshape(b, h, w, 9, kk)
    return jax.nn.softmax(m, axis=3)


def wsum(wts_and_x):
    ws, xx = wts_and_x
    padded = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = [(dy, dx) for dy in range(3) for dx in range(3)]
    outs = []
    for ci in range(c):
        a = None
        for wj, (dy, dx) in zip(ws, shifts):
            t = wj * padded[:, dy:dy + h, dx:dx + w, ci:ci + 1]
            a = t if a is None else a + t
        outs.append(a)
    return outs


def shuffle(accs):
    outs = []
    for a in accs:
        u = a.reshape(b, h, w, k, k).transpose(0, 1, 3, 2, 4)
        outs.append(u.reshape(b, k * h, k * w))
    return jnp.stack(outs, axis=-1)


def shuffle_one(a):
    u = a.reshape(b, h, w, k, k).transpose(0, 1, 3, 2, 4)
    return u.reshape(b, k * h, k * w)


def acts(u):
    d = 0.3 + (150.0 - 0.3) * jax.nn.sigmoid(u[..., 0])
    nrm = u[..., 1:4]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    return d, nrm, jax.nn.sigmoid(u[..., 4])


run("softmax_sliced", lambda m: softmax_sliced(m), (mask,))
run("softmax_5d", lambda m: softmax_5d(m), (mask,))
run("wsum(9tap,5ch)", lambda ws, xx: wsum((ws, xx)), (wts, x))
run("shuffle_x5", lambda accs: shuffle(accs), ([acc] * 5,))
run("shuffle_x1", shuffle_one, (acc,))
run("acts_fp32", acts, (up5,))
