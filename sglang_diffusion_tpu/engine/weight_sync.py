"""Flattened tensor buckets for weight synchronization.

Reference analog: srt/weight_sync/tensor_bucket.py (FlattenedTensorBucket)
+ the RL weight-update transports (update_weights_from_tensor/distributed,
model_runner.py:1132-1507): a trainer ships MANY named weights as ONE flat
buffer + a metadata list, so the transport (IPC, RDMA, file, HTTP) moves a
single contiguous blob instead of thousands of small tensors. The engine
unflattens and applies leaves in place, preserving shardings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import numpy as np


@dataclass
class TensorMeta:
    name: str  # "a/b/c" param-tree path
    shape: Tuple[int, ...]
    dtype: str
    offset: int  # element offset into the flat buffer
    numel: int

    def to_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "shape": list(self.shape),
            "dtype": self.dtype,
            "offset": self.offset,
            "numel": self.numel,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TensorMeta":
        return cls(d["name"], tuple(d["shape"]), d["dtype"], d["offset"],
                   d["numel"])


class FlattenedTensorBucket:
    """Pack {name: array} into one flat float buffer + metadata."""

    def __init__(self, flat: np.ndarray, metas: List[TensorMeta]):
        self.flat = flat
        self.metas = metas

    @classmethod
    def pack(cls, named: Dict[str, np.ndarray],
             dtype=np.float32) -> "FlattenedTensorBucket":
        metas: List[TensorMeta] = []
        total = 0
        for name, arr in named.items():
            n = int(np.prod(arr.shape)) if arr.shape else 1
            metas.append(TensorMeta(name, tuple(arr.shape),
                                    str(np.dtype(dtype)), total, n))
            total += n
        flat = np.empty((total,), dtype)
        for meta, arr in zip(metas, named.values()):
            flat[meta.offset : meta.offset + meta.numel] = np.asarray(
                arr, dtype
            ).reshape(-1)
        return cls(flat, metas)

    def unpack(self) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for m in self.metas:
            out[m.name] = self.flat[m.offset : m.offset + m.numel].reshape(
                m.shape
            )
        return out

    # ---- wire format: raw bytes + JSON metadata ----
    def to_wire(self) -> Tuple[bytes, List[Dict[str, Any]]]:
        return self.flat.tobytes(), [m.to_dict() for m in self.metas]

    @classmethod
    def from_wire(cls, blob: bytes,
                  metas: List[Dict[str, Any]]) -> "FlattenedTensorBucket":
        ms = [TensorMeta.from_dict(d) for d in metas]
        dt = np.dtype(ms[0].dtype) if ms else np.float32
        return cls(np.frombuffer(blob, dt).copy(), ms)
