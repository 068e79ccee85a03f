"""Generate the sf1 (10x sf0.1) dataset if needed and run bench.py on it.

Usage: python tools/bench_sf1.py [out_dir]
Writes the one-line bench JSON to stdout (same contract as bench.py).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gen_sf1 import generate  # noqa: E402

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
generate(out)
env = dict(os.environ, SPARK_GRAFT_SF_DIR=out)
raise SystemExit(
    subprocess.call([sys.executable, os.path.join(REPO, "bench.py")], env=env)
)
