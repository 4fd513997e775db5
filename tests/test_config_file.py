"""ServerArgs config-file loading (reference analog:
srt/server_args_config_parser.py)."""

import argparse
import json

from sglang_diffusion_tpu.config.server_args import ServerArgs


def _parse(argv):
    ap = argparse.ArgumentParser()
    ServerArgs.add_cli_args(ap)
    return ServerArgs.from_cli_args(ap.parse_args(argv))


def test_yaml_config(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("page-size: 16\nschedule_policy: fcfs\ndecode-horizon: 4\n")
    args = _parse(["--config", str(p)])
    assert args.page_size == 16
    assert args.schedule_policy == "fcfs"
    assert args.decode_horizon == 4


def test_cli_overrides_file(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"page_size": 16, "decode_horizon": 4}))
    args = _parse(["--config", str(p), "--page-size", "32"])
    assert args.page_size == 32  # CLI wins
    assert args.decode_horizon == 4  # file fills the rest


def test_no_config_unchanged():
    args = _parse(["--page-size", "8"])
    assert args.page_size == 8
