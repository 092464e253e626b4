"""Runtime core: Engine AOT compile + registry, buffers, pipeline, benchmark."""

import numpy as np

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark
from monocular_depth_estimation_trt_tpu.runtime.buffers import DeviceBuffer, IOBinding
from monocular_depth_estimation_trt_tpu.runtime.engine import Engine, EngineRegistry
from monocular_depth_estimation_trt_tpu.runtime.pipeline import DevicePipeline, Stage


def test_engine_compile_and_run():
    def fn(x):
        return x * 2.0 + 1.0

    eng = Engine(fn, (jnp.ones((4, 4)),), name="test_engine_basic")
    eng.compile()
    assert eng.build_seconds is not None
    out = eng(jnp.ones((4, 4)))
    assert np.allclose(np.asarray(out), 3.0)
    # registry entry recorded
    entry = EngineRegistry().load("test_engine_basic")
    assert entry is not None
    assert entry["inputs"][0]["shape"] == [4, 4]


def test_engine_jit_fallback():
    eng = Engine(lambda x: x + 1, (jnp.zeros((2,)),), name="test_engine_fallback")
    out = eng(jnp.zeros((2,)))  # no explicit compile
    assert np.allclose(np.asarray(out), 1.0)


def test_device_buffer_roundtrip(rng):
    buf = DeviceBuffer((2, 3), np.float32, name="x")
    data = rng.random((2, 3)).astype(np.float32)
    buf.host = data
    dev = buf.h2d()
    assert isinstance(dev, jax.Array)
    out = buf.d2h()
    assert np.allclose(out, data)


def test_io_binding_run(rng):
    binding = IOBinding(
        {"input": ((1, 4), np.float32)}, {"output": ((1, 4), np.float32)}
    )
    binding.inputs["input"].host = rng.random((1, 4)).astype(np.float32)
    eng = Engine(lambda x: x * 3.0, (jnp.zeros((1, 4)),), name="test_engine_io")
    out = binding.run(eng)
    assert np.allclose(out["output"], binding.inputs["input"].host * 3.0)
    # free_buffers parity: device allocations released, host mirror intact
    binding.free()
    assert binding.inputs["input"]._device_arr is None
    assert binding.inputs["input"].host.shape == (1, 4)


def test_device_pipeline_chaining():
    # the VGGT aggregator->heads pattern: intermediates stay on device
    pipe = DevicePipeline(
        [
            Stage("agg", lambda x: x + 1.0, ["images"], ["tokens"]),
            Stage("depth", lambda t: t * 2.0, ["tokens"], ["depth"]),
            Stage("camera", lambda t: t - 1.0, ["tokens"], ["pose"]),
        ]
    )
    out = pipe({"images": jnp.ones((2, 2))})
    assert np.allclose(np.asarray(out["depth"]), 4.0)
    assert np.allclose(np.asarray(out["pose"]), 1.0)
    # fused mode
    fused = jax.jit(pipe.fused(["depth", "pose"]))
    out2 = fused({"images": jnp.ones((2, 2))})
    assert np.allclose(np.asarray(out2["depth"]), 4.0)


def test_benchmark_protocol():
    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig

    fn = jax.jit(lambda x: x @ x)
    report = benchmark(
        fn,
        (jnp.ones((64, 64)),),
        config=BenchmarkConfig(warmup=2, iterations=5),
        name="matmul",
    )
    assert report.iterations == 5
    assert report.fps > 0
    d = report.to_dict()
    assert set(d) >= {"fps", "avg_ms", "p50_ms", "p99_ms"}
