"""Process-per-file test runner (VERDICT r1 'what's weak' item 7): XLA's
CPU client segfaults when too many compiled executables accumulate in one
long pytest process; running each test file in a fresh interpreter bounds
compiler state by construction (the conftest's per-module cache clearing
helps but is a mitigation, not isolation).

Usage:  python scripts/run_tests.py [-jN] [pytest-args...]
Exit code: 0 iff every file passed.
"""

import glob
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    args = sys.argv[1:]
    jobs = 2
    passthrough = []
    for a in args:
        if a.startswith("-j"):
            jobs = int(a[2:])
        else:
            passthrough.append(a)

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    results: dict[str, tuple[int, float, str]] = {}
    lock = threading.Lock()
    queue = list(files)

    def worker():
        while True:
            with lock:
                if not queue:
                    return
                f = queue.pop(0)
            t0 = time.perf_counter()
            p = subprocess.run(
                [sys.executable, "-m", "pytest", f, "-q", *passthrough],
                cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            dt = time.perf_counter() - t0
            tail = p.stdout.decode(errors="replace")[-2000:]
            with lock:
                results[f] = (p.returncode, dt, tail)
                name = os.path.basename(f)
                status = "ok" if p.returncode == 0 else f"FAIL({p.returncode})"
                print(f"[{len(results)}/{len(files)}] {name:40s} {status:9s}"
                      f" {dt:6.1f}s", flush=True)

    threads = [threading.Thread(target=worker) for _ in range(jobs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    failed = {f: r for f, r in results.items() if r[0] != 0}
    print(f"\n{len(files) - len(failed)}/{len(files)} files passed")
    for f, (code, _dt, tail) in failed.items():
        print(f"\n===== {os.path.basename(f)} (exit {code}) =====\n{tail}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
