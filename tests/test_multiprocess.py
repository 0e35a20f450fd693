"""Real multi-process distributed encode (world size 2, CPU backend).

Spawns two coordinated jax.distributed processes that stripe the segments
of one file between them, exchange payloads through
`allgather_payloads`'s world>1 branch (jax.experimental.multihost_utils
process_allgather over the distributed backend), and have rank 0 write the
container — the full `distributed_encode_file` path that single-process CI
can never reach.  SURVEY.md section 4 prescribes exactly this harness.

Marked slow: each worker compiles its own CPU programs (~1 min).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, os.environ["ORZ_REPO"])
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from orz_tpu.parallel import distributed as D
    D.maybe_initialize()
    import jax  # backend now initialized through the distributed client
    rank, world = D.process_info()
    assert world == 2, f"expected world 2, got {world}"
    D.distributed_encode_file(
        os.environ["ORZ_IN"], os.environ["ORZ_OUT"],
        level=1, segment_size=1 << 16,
    )
    print(f"worker {rank}/{world} done", flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_distributed_encode_world2(tmp_path):
    rng = np.random.default_rng(0xD157)
    from tests.conftest import make_text_like

    data = make_text_like(rng, 300_000)  # 5 segments of 64 KiB
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "out.orzt"

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            ORZ_REPO=REPO,
            ORZ_IN=str(src),
            ORZ_OUT=str(out),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            ORZ_NUM_PROCESSES="2",
            ORZ_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        # the image's sitecustomize registers the remote-TPU PJRT plugin in
        # every python process when this is set, which touches the backend
        # before jax.distributed.initialize can run; workers are CPU-only
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                cwd=REPO,
            )
        )

    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, f"worker failed:\n{stderr.decode()[-2000:]}"

    from orz_tpu.device.container import tpu_decode_bytes

    assert tpu_decode_bytes(out.read_bytes()) == data
