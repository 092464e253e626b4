"""Device-resident IO buffers.

API-parity layer for the reference's pinned-memory runtime
(``common_runtime.py``): ``HostDeviceMem`` pairs a pinned host array with a
device pointer (``common_runtime.py:43-89``), ``allocate_buffers`` walks the
engine's IO tensors (``:94-143``), and ``do_inference`` does async H2D ->
execute -> async D2H -> stream sync (``:164-188``).

On TPU the runtime manages staging, so a "buffer" is simply a device
``jax.Array`` plus its host-side numpy mirror; transfers are
``jax.device_put`` (async dispatch) and ``np.asarray`` (sync readback), and
the stream sync is ``block_until_ready``. The value of this module is keeping
inputs resident and avoiding accidental host round-trips between pipeline
stages (the reference's D2D chaining, ``VGGT/onnx2trt2.py:197-208``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np


class DeviceBuffer:
    """One named IO tensor: host mirror + device array.

    Mirrors ``HostDeviceMem`` semantics: assign ``.host`` then call ``.h2d()``;
    read back with ``.d2h()``. Unlike CUDA there is no manual free — drop the
    reference and the backing HBM is reclaimed.
    """

    def __init__(
        self,
        shape: Sequence[int],
        dtype: Any,
        *,
        name: str = "",
        device: Optional[jax.Device] = None,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.name = name
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._host = np.zeros(self.shape, dtype=self.dtype)
        if sharding is None:
            device = device or jax.devices()[0]
            sharding = jax.sharding.SingleDeviceSharding(device)
        self._sharding = sharding
        self._device_arr: Optional[jax.Array] = None

    # -- host side --------------------------------------------------------
    @property
    def host(self) -> np.ndarray:
        return self._host

    @host.setter
    def host(self, data) -> None:
        arr = np.asarray(data)
        if arr.size != self._host.size:
            raise ValueError(
                f"buffer {self.name!r}: size mismatch {arr.size} vs {self._host.size}"
            )
        np.copyto(self._host, arr.reshape(self.shape).astype(self._host.dtype, copy=False))

    # -- transfers --------------------------------------------------------
    def h2d(self) -> jax.Array:
        """Async host->device transfer (dispatches immediately, like
        ``cudaMemcpyAsync`` H2D at ``common_runtime.py:167``)."""
        self._device_arr = jax.device_put(self._host, self._sharding)
        return self._device_arr

    def set_device(self, arr: jax.Array) -> None:
        """Adopt a device array produced by a kernel (keeps data on device —
        the D2D chaining pattern of ``VGGT/onnx2trt2.py:201-205``)."""
        self._device_arr = arr

    @property
    def device(self) -> jax.Array:
        if self._device_arr is None:
            return self.h2d()
        return self._device_arr

    def d2h(self, *, sync: bool = True) -> np.ndarray:
        if self._device_arr is None:
            return self._host
        if sync:
            self._device_arr.block_until_ready()
        np.copyto(self._host, np.asarray(self._device_arr))
        return self._host

    def free(self) -> None:
        """Release the device allocation (``free_buffers`` parity,
        reference ``common_runtime.py:147-152``; dropping the reference is
        equivalent — jax reclaims HBM on GC — but explicit delete is
        immediate)."""
        if self._device_arr is not None:
            try:
                self._device_arr.delete()
            except Exception:
                pass
            self._device_arr = None


class IOBinding:
    """Named input/output buffer set for one engine.

    Replaces ``allocate_buffers`` + the inputs/outputs/bindings triple of the
    reference (``common_runtime.py:94-143``): construct from a signature dict,
    assign ``.inputs[name].host``, run the engine, read ``.outputs[name]``.
    """

    def __init__(
        self,
        input_sig: Dict[str, Tuple[Sequence[int], Any]],
        output_sig: Dict[str, Tuple[Sequence[int], Any]],
        device: Optional[jax.Device] = None,
    ):
        self.inputs = {
            n: DeviceBuffer(s, d, name=n, device=device) for n, (s, d) in input_sig.items()
        }
        self.outputs = {
            n: DeviceBuffer(s, d, name=n, device=device) for n, (s, d) in output_sig.items()
        }

    def h2d_all(self):
        return [b.h2d() for b in self.inputs.values()]

    def run(self, engine) -> Dict[str, np.ndarray]:
        """H2D -> execute -> D2H -> sync: ``do_inference`` parity
        (``common_runtime.py:164-188``)."""
        args = [b.device for b in self.inputs.values()]
        results = engine(*args)
        if not isinstance(results, (tuple, list)):
            results = (results,)
        out = {}
        for buf, arr in zip(self.outputs.values(), results):
            buf.set_device(arr)
        for name, buf in self.outputs.items():
            out[name] = buf.d2h()
        return out

    def free(self) -> None:
        """``free_buffers`` parity (reference ``common_runtime.py:147-152``)."""
        for b in list(self.inputs.values()) + list(self.outputs.values()):
            b.free()
