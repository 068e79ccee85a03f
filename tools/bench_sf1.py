"""Generate the sf1 (10x sf0.1) dataset if needed and run bench.py on it.

Usage: python tools/bench_sf1.py [out_dir] [--skew]
Writes the one-line bench JSON to stdout (same contract as bench.py).
--skew generates/benches the hot-key variant (gen_sf1 --skew).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gen_sf1 import generate  # noqa: E402

args = [a for a in sys.argv[1:] if a != "--skew"]
skew = "--skew" in sys.argv[1:]
out = args[0] if args else (
    "/tmp/spark_graft_sf1_skew" if skew else "/tmp/spark_graft_sf1"
)
generate(out, skew=skew)
env = dict(os.environ, SPARK_GRAFT_SF_DIR=out)
raise SystemExit(
    subprocess.call([sys.executable, os.path.join(REPO, "bench.py")], env=env)
)
