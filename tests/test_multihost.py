"""Multi-host (DCN) dryrun: the shard_map program across processes.

SURVEY §2.11 item 1 names "multi-host via DCN with the same
collective". parallel/multihost.py spawns N jax.distributed processes
(K virtual CPU devices each, gloo collectives standing in for DCN) and
runs the batched sharded search over the GLOBAL mesh; every process
asserts exact oracle parity on the replicated output. This test drives
the 2x2 cluster (small on purpose: two fresh jax imports on one vCPU).
"""

def test_dryrun_multihost_2proc():
    from iresearch_tpu.parallel.multihost import dryrun_multihost

    dryrun_multihost(num_processes=2, devices_per_proc=2)
