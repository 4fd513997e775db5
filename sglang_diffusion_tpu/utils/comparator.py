"""Tensor dumper + cross-run comparator.

Reference analog: srt/debug_utils/ (dumper.py forward-hook tensor dumps +
comparator/ cross-run numeric diffing). Functional-JAX twist: there are no
module hooks, so dumping happens at the step boundary — the engine writes
each step's (inputs, logits, sampled tokens) when --debug-dump-dir is set —
and the comparator aligns two dump directories by step/tensor name and
reports max/mean absolute differences (catching numerics drift between
backends, shardings, or code revisions).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional

import numpy as np


class Dumper:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.step = 0

    def dump(self, name: str, **tensors) -> None:
        arrays = {}
        for k, v in tensors.items():
            if v is None:
                continue
            arrays[k] = np.asarray(v)
        np.savez(
            os.path.join(self.out_dir, f"{self.step:06d}_{name}.npz"),
            **arrays,
        )
        self.step += 1


def compare_dirs(dir_a: str, dir_b: str, atol: float = 0.0,
                 rtol: float = 0.0) -> Dict[str, Any]:
    """Align dumps by filename; report per-tensor max/mean abs diff.
    Returns {"files": [...], "mismatches": [...], "missing": [...]}."""
    files_a = {os.path.basename(p) for p in glob.glob(dir_a + "/*.npz")}
    files_b = {os.path.basename(p) for p in glob.glob(dir_b + "/*.npz")}
    report: Dict[str, Any] = {
        "files": [],
        "mismatches": [],
        "missing": sorted((files_a ^ files_b)),
    }
    for f in sorted(files_a & files_b):
        a = np.load(os.path.join(dir_a, f))
        b = np.load(os.path.join(dir_b, f))
        for key in sorted(set(a.files) & set(b.files)):
            x, y = a[key], b[key]
            entry = {"file": f, "tensor": key}
            if x.shape != y.shape:
                entry["error"] = f"shape {x.shape} vs {y.shape}"
                report["mismatches"].append(entry)
                continue
            xf = x.astype(np.float64)
            yf = y.astype(np.float64)
            diff = np.abs(xf - yf)
            entry["max_abs"] = float(diff.max()) if diff.size else 0.0
            entry["mean_abs"] = float(diff.mean()) if diff.size else 0.0
            denom = np.maximum(np.abs(yf), 1e-9)
            entry["max_rel"] = float((diff / denom).max()) if diff.size else 0.0
            report["files"].append(entry)
            if entry["max_abs"] > atol + rtol * float(np.abs(yf).max() or 1):
                report["mismatches"].append(entry)
        for key in sorted(set(a.files) ^ set(b.files)):
            report["mismatches"].append(
                {"file": f, "tensor": key, "error": "missing in one run"}
            )
    return report


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="Compare two engine dump directories"
    )
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--atol", type=float, default=1e-5)
    ap.add_argument("--rtol", type=float, default=0.0)
    args = ap.parse_args(argv)
    rep = compare_dirs(args.dir_a, args.dir_b, args.atol, args.rtol)
    print(json.dumps({
        "compared": len(rep["files"]),
        "mismatches": rep["mismatches"][:50],
        "missing": rep["missing"][:50],
        "worst": max(rep["files"], key=lambda e: e.get("max_abs", 0.0))
        if rep["files"] else None,
    }, indent=2))
    if rep["mismatches"] or rep["missing"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
