"""Multi-process (DCN-analog) bring-up: 2 OS processes join a
jax.distributed process group over localhost gRPC, build a (2, 2) mesh
whose "data" axis SPANS the processes, and run one sharded_train_step.

This is the missing coverage for SURVEY §2.4's distributed-backend row
(parallel/mesh.py initialize_distributed): single-process 8-device
virtualization exercises SPMD semantics but never process-group bring-up,
cross-process collectives (Gloo on CPU, DCN on real pods), or the
host-local <-> global array plumbing a real multi-host deployment needs.

Both workers must agree with each other AND with the single-device
reference step computed in this (separate, 8-device) process.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from splatloam_tpu.model import surfels as S

from test_parallel import _setup, _single_device_reference


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_group_runs_sharded_step(rng):
    worker = Path(__file__).parent / "_mp_worker.py"
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err}"
        outs.append(json.loads(line[-1][len("RESULT "):]))

    for o in outs:
        assert o["processes"] == 2
        assert o["global_devices"] == 4
        assert o["adam_step"] == 1

    # both processes computed the identical replicated result
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    np.testing.assert_allclose(outs[0]["xyz_head"], outs[1]["xyz_head"],
                               atol=1e-6)

    # and it matches the single-device step run in THIS process
    surf, adam, K, T_cw, depth, valid = _setup(rng)
    ref_surf, ref_adam, ref_loss = _single_device_reference(
        surf, adam, K, T_cw, depth, valid, S.AdamHyper())
    assert outs[0]["loss"] == pytest.approx(float(ref_loss), rel=2e-5)
    np.testing.assert_allclose(
        np.asarray(outs[0]["xyz_head"]),
        np.asarray(ref_surf.params.xyz)[:8], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(outs[0]["mu_head"]),
        np.asarray(ref_adam.mu.xyz)[:8], atol=1e-5)
