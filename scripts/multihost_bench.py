"""Multi-host scaling-efficiency harness (BASELINE.md config 4: >=0.7
efficiency on a 2-host map-sharded run).

Measures the distributed-BA iteration throughput at 1 process vs N processes
over the same total device count budget, reporting
    efficiency = t_1proc / (t_Nproc)
for a fixed global problem (strong scaling of the host dimension: the same
mesh size split across more controllers — isolates the jax.distributed /
cross-process collective overhead that real 2-host DCN runs add on top).

On this machine the "hosts" are fake (CPU processes on localhost), so the
number measures harness + collective-path overhead, not DCN; run the same
script with real COORDINATOR_ADDRESS/NUM_PROCESSES on two hosts for the
BASELINE measurement.

Usage: python scripts/multihost_bench.py [--devices 8] [--reps 5]
"""

import argparse
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(n_proc: int, devices_per_proc: int, reps: int) -> float:
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out.npz")
        procs = [subprocess.Popen(
            [sys.executable, WORKER, "--port", str(port),
             "--nproc", str(n_proc), "--pid", str(pid),
             "--devices", str(devices_per_proc), "--out", out,
             "--reps", str(reps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in range(n_proc)]
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            if p.returncode != 0:
                raise RuntimeError(log[-3000:])
        d = np.load(out)
        return float(d["elapsed"]) / int(d["reps"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8,
                    help="total virtual devices (split across processes)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    t1 = run_config(1, args.devices, args.reps)
    t2 = run_config(2, args.devices // 2, args.reps)
    eff = t1 / t2
    print(f"1-process ({args.devices} dev): {t1*1000:.1f} ms/BA")
    print(f"2-process ({args.devices // 2} dev each): {t2*1000:.1f} ms/BA")
    print(f"scaling efficiency (t1/t2): {eff:.3f}")


if __name__ == "__main__":
    main()
