"""Real multi-process training (VERDICT round-1 #4): spawn 2 OS processes,
``jax.distributed.initialize`` over localhost, build a mesh spanning both
processes' virtual CPU devices (4 + 4), drive fit()'s GSPMD train step with
per-host-sharded batches from a deterministic global shuffle, and assert
per-step loss equality with the single-process run."""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    coordinator = f"localhost:{_free_port()}"

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "pcnerf_tpu.parallel._mh_worker",
             coordinator, "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    # single-process reference: same driver, no mesh
    from pcnerf_tpu.parallel import _mh_worker
    ref_path = str(tmp_path / "loss_ref.json")
    _mh_worker.run(None, ref_path, "single")

    ref = json.load(open(ref_path))["losses"]
    l0 = json.load(open(tmp_path / "loss_0.json"))["losses"]
    l1 = json.load(open(tmp_path / "loss_1.json"))["losses"]
    assert len(ref) == len(l0) == len(l1) == _mh_worker.N_STEPS
    np.testing.assert_allclose(l0, l1, rtol=0)        # replicated: identical
    np.testing.assert_allclose(l0, ref, rtol=1e-4)    # == single-process
