"""Multi-host (multi-process) bring-up: ``init_distributed`` exercised for
real — two OS processes, two local CPU devices each, one GLOBAL ``data:4``
mesh, gloo collectives over localhost (the DCN stand-in), and a sharded
render gradient that must equal the single-process value.

This is the TPU-native replacement for the reference's dead DDP scaffolding
(``nerf/utils_init_nerf.py:76-78``; SURVEY.md §2.3): the same
``make_mesh``/``shard_batch``/``replicate`` helpers span hosts once
``jax.distributed.initialize`` has run, with XLA inserting the cross-process
grad psum (docs/ROADMAP.md framework #1)."""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

import pytest

pytestmark = pytest.mark.slow  # multi-minute tier (see pyproject markers)

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, %(repo)r)
    from customnerf_tpu.parallel.mesh import (init_distributed, make_mesh,
                                              replicate, shard_batch)

    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    assert init_distributed("localhost:" + port, num_processes=2,
                            process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays
    from customnerf_tpu.ops.grid import GridSpec

    grid = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32,
                    gridtype="tiled")
    field = NeRFField(FieldConfig(grid=grid))
    params = field.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(num_steps=8, upsample_steps=0, soft_mask=True)

    rng = np.random.RandomState(0)
    n = 16
    o = jnp.asarray(np.tile([[0, 0, -1.5]], (n, 1)).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tgt = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def loss_fn(p, o_, d_, t_):
        outp = render_rays(field, p, o_, d_, jax.random.PRNGKey(1), s)
        return jnp.mean((outp["image"] - t_) ** 2)

    mesh = make_mesh("data:4")          # spans both processes
    params_r = replicate(mesh, params)
    o_s, d_s, t_s = shard_batch(mesh, (o, d, tgt))
    g = jax.jit(jax.grad(loss_fn))(params_r, o_s, d_s, t_s)
    if pid == 0:
        flat = jax.tree_util.tree_leaves(g)
        np.savez(out, *[np.asarray(x) for x in flat])
    # all processes must reach teardown together (collective barrier)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("done")
    print("WORKER_OK", pid)
""")


def _free_port() -> int:
    with socket.socket() as sk:
        sk.bind(("localhost", 0))
        return sk.getsockname()[1]


def test_two_process_distributed_grad_matches_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": repo})
    out = tmp_path / "grads.npz"
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port, str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"proc {i} failed:\n{log[-3000:]}"
        assert f"WORKER_OK {i}" in log

    # single-process grads on identical inputs
    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import RenderSettings, render_rays
    from customnerf_tpu.ops.grid import GridSpec

    grid = GridSpec(num_levels=4, level_dim=2, base_resolution=4,
                    log2_hashmap_size=10, desired_resolution=32,
                    gridtype="tiled")
    field = NeRFField(FieldConfig(grid=grid))
    params = field.init_params(jax.random.PRNGKey(0))
    s = RenderSettings(num_steps=8, upsample_steps=0, soft_mask=True)
    rng = np.random.RandomState(0)
    n = 16
    o = jnp.asarray(np.tile([[0, 0, -1.5]], (n, 1)).astype(np.float32))
    d = rng.randn(n, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    tgt = jnp.asarray(rng.rand(n, 3).astype(np.float32))

    def loss_fn(p):
        outp = render_rays(field, p, o, d, jax.random.PRNGKey(1), s)
        return jnp.mean((outp["image"] - tgt) ** 2)

    g_single = jax.tree_util.tree_leaves(jax.grad(loss_fn)(params))
    with np.load(out) as z:
        g_multi = [z[k] for k in z.files]
    assert len(g_single) == len(g_multi)
    for a, b in zip(g_single, g_multi):
        np.testing.assert_allclose(
            b, np.asarray(a), rtol=2e-4, atol=1e-7,
            err_msg="cross-process sharded grad != single-process grad")
