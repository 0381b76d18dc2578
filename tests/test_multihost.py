"""Multi-host validation without a cluster: 2 real processes on localhost
run `init_distributed` (jax.distributed.initialize over the DCN-equivalent
grpc/Gloo path) and psum across process boundaries (SURVEY.md §2.3 multi-
host row; VERDICT r1 item 8 — init_distributed must not be dead code)."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from octave_tpu.parallel.mesh import DATA_AXIS, init_distributed, make_mesh

    pid = int(sys.argv[1])
    init_distributed({coord!r}, 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    x = jnp.ones((1,)) * (pid + 1)
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P(DATA_AXIS)),
        [jax.device_put(x, jax.local_devices()[0])])
    s = jax.shard_map(lambda a: jax.lax.psum(a, DATA_AXIS), mesh=mesh,
                      in_specs=P(DATA_AXIS), out_specs=P(), check_vma=False)
    tot = jax.jit(s)(arr)
    val = float(np.asarray(tot.addressable_shards[0].data)[0])
    assert val == 3.0, val  # 1 + 2 summed across processes
    print(f"proc {{pid}} OK val={{val}}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_init_distributed(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO, coord=f"localhost:{port}"))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the workers build their own 2-device global view; drop the virtual
    # 8-device flag the test conftest sets for this process
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )

    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK val=3.0" in out
