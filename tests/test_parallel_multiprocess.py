"""Multi-process (DCN-shaped) mesh path: 2 subprocess workers x 4 CPU
devices each form one global 8-device DP mesh via `jax.distributed` +
`jax.make_array_from_process_local_data`, and the global train step must
equal the single-process 8-device step bit-for-bit-ish (SURVEY.md §5
'Distributed communication backend'; VERDICT r2 #7)."""
import os
import pathlib
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = pathlib.Path(__file__).resolve().parent


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_loss():
    from mp_worker import build_step_inputs
    from tts_arabic_tpu.parallel import (data_parallel_jit, make_mesh,
                                         replicate, shard_batch)

    mesh = make_mesh(n_devices=8)
    state, step_fn, batch = build_step_inputs(8)
    dp_step = data_parallel_jit(
        lambda s, b: step_fn(s, b, jax.random.PRNGKey(0)), mesh)
    state = replicate(state, mesh)
    _, meta = dp_step(state, shard_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, mesh))
    return float(meta["loss"])


def test_two_process_dp_step_matches_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ref = _single_process_loss()

    port = _free_port()
    env = dict(os.environ)
    # children configure their own 4-device CPU runtime
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(HERE.parent), str(HERE), env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "mp_worker.py"), str(i), "2",
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    losses = []
    for out in outs:
        m = re.search(r"loss=([-\d.eE]+) devices=8 procs=2", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    # both processes see the replicated global loss, equal to the
    # single-process step up to reduction-order rounding
    assert losses[0] == losses[1]
    np.testing.assert_allclose(losses[0], ref, rtol=2e-4)
