"""Two-process DCN dryrun: ``jax.distributed`` across a real process boundary.

Every other multi-device proof in the suite is a single-process virtual
mesh; this one launches TWO OS processes x 4 CPU devices each, initializes
the cluster through ``parallel.mesh.distributed_init`` (the same entry the
batch CLIs call on multi-host slices, SURVEY §5.8), runs one data-parallel
training step whose gradient psum crosses the process boundary, and checks
the result against a single-process 8-device oracle. Also pins
``host_shard``'s per-host input split. Reference scope: the reference has
no distributed execution at all (SURVEY §2.3); this is the TPU-native
multi-host path's offline gate.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "dcn_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(port: int, pid: int, nproc: int, ndev: int) -> dict:
    env = dict(os.environ)
    # the experimental axon relay plugin registers itself from
    # sitecustomize when PALLAS_AXON_POOL_IPS is set and then shadows
    # JAX_PLATFORMS=cpu; the workers must be pure-CPU processes
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_AXON_REGISTERED", None)
    # script-mode python puts the SCRIPT's dir on sys.path, not the cwd:
    # the workers need the repo root explicitly (the suite must not depend
    # on the launcher's PYTHONPATH)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env["JAX_NUM_PROCESSES"] = str(nproc)
    env["JAX_PROCESS_ID"] = str(pid)
    return env


def _oracle_env(ndev: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_AXON_REGISTERED", None)
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    env["PYTHONPATH"] = str(REPO) + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    return env


def test_two_process_dcn_train_step(tmp_path):
    # bounded by the communicate(timeout=...) calls below, not a marker
    # (pytest-timeout is not in this image)
    port = _free_port()
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(outs[i])],
            env=_worker_env(port, i, 2, 4),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=str(REPO),
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DCN worker timed out")
        logs.append(err.decode(errors="replace"))
        assert p.returncode == 0, f"worker failed:\n{logs[-1][-2000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    for i, r in enumerate(results):
        assert r["process_count"] == 2
        assert r["process_index"] == i
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
        assert r["mesh_shape"] == {"data": 8, "model": 1}
        assert r["step_no"] == 1

    # both processes computed the SAME replicated loss and updated params
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-9)
    assert results[0]["fingerprint"] == pytest.approx(
        results[1]["fingerprint"], rel=1e-9
    )

    # host_shard: disjoint per-process input halves covering everything
    s0, s1 = results[0]["host_shard"], results[1]["host_shard"]
    assert s0 == list(range(0, 10, 2)) and s1 == list(range(1, 10, 2))

    # single-process oracle on the same 8-device shape: the cross-process
    # gradient psum must agree with the in-process one
    oracle_out = tmp_path / "oracle.json"
    p = subprocess.run(
        [sys.executable, str(WORKER), str(oracle_out)],
        env=_oracle_env(8),
        capture_output=True,
        timeout=420,
        cwd=str(REPO),
    )
    assert p.returncode == 0, p.stderr.decode(errors="replace")[-2000:]
    oracle = json.loads(oracle_out.read_text())
    assert oracle["process_count"] == 1 and oracle["global_devices"] == 8
    # cross-process psum vs in-process reduction: same math, different
    # reduction order -> relative tolerance, not bitwise
    assert results[0]["loss"] == pytest.approx(oracle["loss"], rel=1e-6)
    assert results[0]["fingerprint"] == pytest.approx(
        oracle["fingerprint"], rel=1e-6
    )

    # inference sweep (round 4): pages host-sharded across the two
    # processes, the full detect/geometry/recognize pipeline data-parallel
    # over each process's local devices, per-page line counts allgathered
    # across the process boundary. The union of per-process texts must equal
    # the single-process oracle's run of ALL pages, and both processes must
    # have gathered identical global line counts.
    inf0, inf1 = results[0]["inference"], results[1]["inference"]
    assert inf0["pages"] == [0, 2] and inf1["pages"] == [1, 3]
    assert inf0["global_line_counts"] == inf1["global_line_counts"]
    merged = {**inf0["texts"], **inf1["texts"]}
    oracle_inf = oracle["inference"]
    assert oracle_inf["pages"] == [0, 1, 2, 3]
    assert merged == oracle_inf["texts"]
    assert oracle_inf["global_line_counts"] == inf0["global_line_counts"]
