"""Suite runner (reference analog: test/run_suite.py + ci_register.py).

Suites partition the tests by cost/hardware the way the reference's staged
CI does (stage-a fast units, stage-b engine e2e, stage-c SPMD/perf):

    python tests/run_suite.py --suite per-commit
    python tests/run_suite.py --suite nightly
"""

from __future__ import annotations

import argparse
import subprocess
import sys

SUITES = {
    # fast host-only units
    "unit": [
        "tests/test_radix_cache.py",
        "tests/test_radix_cache_cpp.py",
        "tests/test_quantization.py",
        "tests/test_attention_ops.py",
    ],
    # engine + kernels on the virtual CPU mesh
    "per-commit": [
        "tests/test_radix_cache.py",
        "tests/test_radix_cache_cpp.py",
        "tests/test_quantization.py",
        "tests/test_attention_ops.py",
        "tests/test_attention_pallas.py",
        "tests/test_flash_pallas.py",
        "tests/test_engine_e2e.py",
        "tests/test_sampling_features.py",
        "tests/test_speculative.py",
        "tests/test_multichip.py",
        "tests/test_usp.py",
        "tests/test_http_server.py",
        "tests/test_image_api.py",
        "tests/test_diffusion.py",
        "tests/test_weight_loading.py",
    ],
    # adds the slow HF numerics parity runs
    "nightly": ["tests/"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="per-commit", choices=sorted(SUITES))
    ap.add_argument("--timeout-per-file", type=int, default=600)
    args = ap.parse_args()
    targets = SUITES[args.suite]
    cmd = [sys.executable, "-m", "pytest", "-q", *targets]
    print("+", " ".join(cmd), flush=True)
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
