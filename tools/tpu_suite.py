"""Run the TPU-only kernel suite on the real chip and commit the result
as a per-round artifact (r3 VERDICT item 6: chip-path equality claims
must carry committed evidence each round, like BENCH does).

Writes tools/tpu_suite_results.json with the pass/fail counts, the test
ids, platform, and wall time.

Usage: python tools/tpu_suite.py
"""

import json
import os
import re
import subprocess
import sys
import time


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RUN_TPU_TESTS="1")
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_tpu_kernels.py",
         "-v", "--tb=line"],
        capture_output=True, text=True, cwd=root, env=env, timeout=3600,
    )
    wall = time.perf_counter() - t0
    tests = re.findall(r"(test_tpu_kernels\.py::\S+)\s+(PASSED|FAILED)",
                       r.stdout)
    tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    mp = re.search(r"(\d+) passed", tail)
    mf = re.search(r"(\d+) failed", tail)
    out = {
        "returncode": r.returncode,
        "summary": tail,
        "wall_s": round(wall, 1),
        "n_passed": int(mp.group(1)) if mp else 0,
        "n_failed": int(mf.group(1)) if mf else 0,
        "tests": [t for t, _ in tests],
    }
    path = os.path.join(root, "tools", "tpu_suite_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": tail, "wall_s": out["wall_s"],
                      "n_passed": out["n_passed"],
                      "n_failed": out["n_failed"]}))
    return 0 if r.returncode == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
