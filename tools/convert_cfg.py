#!/usr/bin/env python
"""Convert reference-format model cfg YAML into the canonical
yolo-series-tpu cfg format (lowercase module names, plain activation
strings, flow-style rows). The graph topology is preserved exactly; only
the encoding changes.

Usage: python tools/convert_cfg.py <src.yaml> <dst.yaml>
       python tools/convert_cfg.py --all <src_dir> <dst_dir>
"""

import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from yolo_series_tpu.models.graph import _REF_NAMES  # noqa: E402
from yolo_series_tpu.models.layers import get_activation  # noqa: E402


def _norm_arg(a):
    if isinstance(a, str):
        if a.startswith("nn."):
            return get_activation(a)[0]
        if a == "None":  # the reference relies on eval('None') at parse time
            return None
        if a in ("True", "False"):
            return a == "True"
    return a


def convert(src: str | dict) -> dict:
    d = yaml.safe_load(open(src)) if isinstance(src, (str, Path)) else src
    out = {}
    for k in ("nc", "depth_multiple", "width_multiple", "anchors"):
        if k in d:
            out[k] = d[k]
    for section in ("backbone", "head"):
        rows = []
        for f, n, m, args in d[section]:
            name = _REF_NAMES.get(m, str(m).lower())
            args = [_norm_arg(a) for a in args]
            rows.append([f, n, name, args])
        out[section] = rows
    return out


class _FlowRow(list):
    pass


def _flow_row_representer(dumper, data):
    return dumper.represent_sequence("tag:yaml.org,2002:seq", data, flow_style=True)


yaml.add_representer(_FlowRow, _flow_row_representer)


def dump(cfg: dict, dst: str):
    cfg = dict(cfg)
    for section in ("backbone", "head"):
        cfg[section] = [_FlowRow(r) for r in cfg[section]]
    cfg["anchors"] = [_FlowRow(a) for a in cfg["anchors"]]
    with open(dst, "w") as f:
        yaml.dump(cfg, f, sort_keys=False, width=120)


def main():
    args = sys.argv[1:]
    if args and args[0] == "--all":
        src_dir, dst_dir = Path(args[1]), Path(args[2])
        dst_dir.mkdir(parents=True, exist_ok=True)
        for p in sorted(src_dir.rglob("*.yaml")):
            rel = p.relative_to(src_dir)
            dst = dst_dir / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            try:
                dump(convert(p), dst)
                print(f"converted {p} -> {dst}")
            except Exception as e:  # noqa: BLE001
                print(f"SKIP {p}: {e}")
    else:
        dump(convert(args[0]), args[1])


if __name__ == "__main__":
    main()
