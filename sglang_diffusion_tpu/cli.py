"""CLI entrypoints (reference analog: python/sglang/cli/{main,serve,generate}.py).

Usage:
    python -m sglang_diffusion_tpu.cli serve --model-path <dir> --port 30000
    python -m sglang_diffusion_tpu.cli generate --model-path <dir> --prompt "..."
    python -m sglang_diffusion_tpu.cli version
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(prog="sglang-diffusion-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    from sglang_diffusion_tpu.config.server_args import ServerArgs

    p_serve = sub.add_parser("serve", help="launch the HTTP server")
    ServerArgs.add_cli_args(p_serve)

    p_gen = sub.add_parser("generate", help="offline generation")
    ServerArgs.add_cli_args(p_gen)
    p_gen.add_argument("--prompt", type=str, required=True)
    p_gen.add_argument("--max-new-tokens", type=int, default=128)
    p_gen.add_argument("--temperature", type=float, default=0.0)

    sub.add_parser("version", help="print version")

    p_router = sub.add_parser(
        "router", help="launch the native model gateway (C++ sgld-gateway)"
    )
    p_router.add_argument("--port", type=int, default=30080)
    p_router.add_argument("--worker", action="append", default=[],
                          help="worker base URL (repeatable)")
    p_router.add_argument("--policy", default="cache_aware",
                          choices=["cache_aware", "round_robin", "random",
                                   "shortest_queue", "power_of_two",
                                   "consistent_hash"])
    p_router.add_argument("--cache-threshold", type=float, default=0.5)
    p_router.add_argument("--balance-abs-threshold", type=int, default=32)
    p_router.add_argument("--balance-rel-threshold", type=float, default=1.0001)
    p_router.add_argument("--health-interval", type=int, default=5)

    args = parser.parse_args(argv)
    if args.cmd == "router":
        from sglang_diffusion_tpu.gateway import GatewayProcess

        gw = GatewayProcess(
            args.port, args.worker, policy=args.policy,
            cache_threshold=args.cache_threshold,
            balance_abs_threshold=args.balance_abs_threshold,
            balance_rel_threshold=args.balance_rel_threshold,
            health_interval=args.health_interval,
        )
        print(f"gateway on :{args.port} -> {args.worker}", file=sys.stderr)
        try:
            gw.proc.wait()
        except KeyboardInterrupt:
            gw.shutdown()
        return 0
    if args.cmd == "version":
        import sglang_diffusion_tpu

        print(sglang_diffusion_tpu.__version__)
        return 0

    server_args = ServerArgs.from_cli_args(args)
    if args.cmd == "serve":
        from sglang_diffusion_tpu.server.api_server import launch_server

        launch_server(server_args)
        return 0

    if args.cmd == "generate":
        from sglang_diffusion_tpu.engine.engine import Engine
        from sglang_diffusion_tpu.sampling.params import SamplingParams

        eng = Engine(server_args=server_args)
        out = eng.generate(
            args.prompt,
            SamplingParams(
                max_new_tokens=args.max_new_tokens, temperature=args.temperature
            ),
        )
        print(json.dumps(out, indent=2))
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
