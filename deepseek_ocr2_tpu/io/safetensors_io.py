"""Safetensors <-> JAX weight I/O.

TPU-native equivalent of the reference's weight-loading stack
(reference store_adapters.rs:8-167 and main.rs:811-839, 1361-1399):

- reads HF PyTorch-layout safetensors into a flat {name: np.ndarray} dict,
- applies a per-prefix dtype policy (SelectiveCastDTypeAdapter equivalent,
  reference store_adapters.rs:105-167),
- supports regex-filtered partial loads (text-only path skips the vision
  tower, reference main.rs:824-827),
- produces a load report (applied/missing/skipped/errors,
  reference main.rs:832-838).

The PyTorch->JAX layout transform (linear-weight transpose etc.) lives with
each model's `params_from_flat` builder, keeping this module model-agnostic.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

try:  # ml_dtypes ships with jax; gives us a numpy bfloat16.
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_FLOAT_KINDS = ("f", "V")  # bfloat16 appears as void ("V") without ml_dtypes


def _is_float(arr: np.ndarray) -> bool:
    if _BFLOAT16 is not None and arr.dtype == _BFLOAT16:
        return True
    return arr.dtype.kind == "f"


@dataclasses.dataclass
class DtypePolicy:
    """Per-prefix dtype cast policy for float tensors.

    Equivalent of the reference's `SelectiveCastDTypeAdapter`
    (store_adapters.rs:105-167): a default target dtype plus longest-match
    per-prefix overrides. Non-float tensors are never cast. A target of
    ``None`` keeps the stored dtype.
    """

    default: Optional[str] = "bfloat16"
    prefixes: Dict[str, Optional[str]] = dataclasses.field(default_factory=dict)

    def with_prefix(self, prefix: str, dtype: Optional[str]) -> "DtypePolicy":
        new = dict(self.prefixes)
        new[prefix] = dtype
        return DtypePolicy(default=self.default, prefixes=new)

    def target_for(self, name: str) -> Optional[str]:
        best: Optional[str] = self.default
        best_len = -1
        for prefix, dtype in self.prefixes.items():
            if name.startswith(prefix) and len(prefix) > best_len:
                best = dtype
                best_len = len(prefix)
        return best

    def apply(self, name: str, arr: np.ndarray) -> np.ndarray:
        target = self.target_for(name)
        if target is None or not _is_float(arr):
            return arr
        np_target = np.dtype(_BFLOAT16) if target == "bfloat16" else np.dtype(target)
        if arr.dtype == np_target:
            return arr
        return arr.astype(np_target)


@dataclasses.dataclass
class LoadReport:
    """Load bookkeeping (reference main.rs:832-838)."""

    applied: List[str] = dataclasses.field(default_factory=list)
    missing: List[str] = dataclasses.field(default_factory=list)
    skipped: List[str] = dataclasses.field(default_factory=list)
    errors: List[str] = dataclasses.field(default_factory=list)

    def merge(self, other: "LoadReport") -> None:
        self.applied.extend(other.applied)
        self.missing.extend(other.missing)
        self.skipped.extend(other.skipped)
        self.errors.extend(other.errors)

    def summary(self) -> str:
        return (
            f"loaded: applied={len(self.applied)}, missing={len(self.missing)}, "
            f"skipped={len(self.skipped)}, errors={len(self.errors)}"
        )

    def raise_on_errors(self) -> None:
        if self.errors:
            raise ValueError("weight load errors:\n" + "\n".join(self.errors))


def inspect_safetensors(path: str) -> List[Tuple[str, Tuple[int, ...], str]]:
    """List (name, shape, dtype) for every tensor (reference main.rs:748-772)."""
    from safetensors import safe_open

    out: List[Tuple[str, Tuple[int, ...], str]] = []
    with safe_open(path, framework="numpy") as f:
        for name in sorted(f.keys()):
            sl = f.get_slice(name)
            out.append((name, tuple(sl.get_shape()), str(sl.get_dtype())))
    return out


def load_flat(
    paths: Sequence[str] | str,
    policy: Optional[DtypePolicy] = None,
    include_regex: Optional[Iterable[str]] = None,
) -> Dict[str, np.ndarray]:
    """Load tensors from one or more safetensors files into a flat dict.

    `include_regex`: if given, only tensor names matching at least one of the
    regexes are loaded (reference main.rs:824-827 uses this for the text-only
    path to skip the vision tower).
    """
    from safetensors import safe_open

    if isinstance(paths, str):
        paths = [paths]
    patterns = [re.compile(r) for r in include_regex] if include_regex else None
    policy = policy or DtypePolicy(default=None)

    flat: Dict[str, np.ndarray] = {}
    for path in paths:
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():
                if patterns is not None and not any(p.search(name) for p in patterns):
                    continue
                arr = f.get_tensor(name)
                flat[name] = policy.apply(name, arr)
    return flat


def save_flat(flat: Dict[str, np.ndarray], path: str) -> None:
    """Save a flat {name: array} dict as a safetensors file.

    Used for checkpointing and for the PyTorch-layout round-trip test
    (reference tests/safetensors_pytorch_roundtrip.rs:28-59).
    """
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


class FlatSource:
    """Helper for consuming a flat dict while building param trees.

    Tracks which names were taken so callers can compute skipped/missing
    reports. `take` returns None (and records `missing`) when absent.
    """

    def __init__(self, flat: Dict[str, np.ndarray]):
        self.flat = flat
        self.report = LoadReport()
        self._taken: set = set()

    def take(self, name: str, transpose: bool = False) -> Optional[np.ndarray]:
        arr = self.flat.get(name)
        if arr is None:
            self.report.missing.append(name)
            return None
        self._taken.add(name)
        self.report.applied.append(name)
        if transpose:
            arr = np.ascontiguousarray(arr.T)
        return arr

    def has(self, name: str) -> bool:
        return name in self.flat

    def finish(self, prefix: str = "") -> LoadReport:
        """Record untouched tensors under `prefix` as skipped."""
        for name in self.flat:
            if name.startswith(prefix) and name not in self._taken:
                self.report.skipped.append(name)
        return self.report
