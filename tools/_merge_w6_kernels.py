"""One-shot: run bench_kernels.bench_w6 on the chip and merge the rows
into the LATEST KERNELS.json entry (the 2026-08-20 P5 sweep already ran;
re-running the full sweep would waste ~25 min of chip time)."""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.bench_kernels import bench_w6  # noqa: E402

out = REPO / "KERNELS.json"
history = json.loads(out.read_text())
rows = bench_w6(iters_serve=int(sys.argv[1]) if len(sys.argv) > 1 else 10)
history[-1]["w6"] = rows
out.write_text(json.dumps(history, indent=1))
print(json.dumps(rows))
