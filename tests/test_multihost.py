"""Multi-host (DCN-analogue) validation: N real python processes
coordinated by `jax.distributed`, solving a globally-sharded batch of
windows over the combined device mesh (SURVEY §2.2's multi-host row —
pods are unavailable, so multi-PROCESS CPU is the real-protocol stand-in)."""

import pytest

from ctrlvio_tpu.parallel.multihost import launch


@pytest.mark.slow
def test_two_process_global_mesh_solve():
    launch(num_processes=2, local_devices=4, port=39741)
