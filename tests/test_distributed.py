"""Multi-host topology discovery (uml_tpu.core.distributed).

The real multi-process handshake needs multiple hosts; here we pin the
pure parts: env parsing, the Slurm nodelist head expansion, and the
single-process no-op contract that every CLI relies on.
"""

from uml_tpu.core.distributed import (
    ProcessTopology,
    _first_slurm_host,
    detect_topology,
    maybe_initialize,
)


def test_single_process_is_none():
    assert detect_topology(env={}) is None


def test_explicit_env():
    topo = detect_topology(env={
        "UML_COORDINATOR": "10.0.0.1:9999",
        "UML_NUM_PROCESSES": "4",
        "UML_PROCESS_ID": "2",
    })
    assert topo == ProcessTopology("10.0.0.1:9999", 4, 2)


def test_slurm_env():
    topo = detect_topology(env={
        "SLURM_NTASKS": "8",
        "SLURM_PROCID": "5",
        "SLURM_NODELIST": "tpu-host[3-10]",
    })
    assert topo.coordinator_address == "tpu-host3:8476"
    assert topo.num_processes == 8
    assert topo.process_id == 5


def test_slurm_single_task_is_none():
    assert detect_topology(env={"SLURM_NTASKS": "1",
                                "SLURM_PROCID": "0"}) is None


def test_nodelist_expansion():
    assert _first_slurm_host("node[17-21,40]") == "node17"
    assert _first_slurm_host("plainhost") == "plainhost"
    assert _first_slurm_host("a3,b7") == "a3"


def test_auto_distributed_opt_in():
    topo = detect_topology(env={"UML_AUTO_DISTRIBUTED": "1"})
    assert topo is not None and topo.num_processes == 0


def test_maybe_initialize_noop_single_process():
    assert maybe_initialize(env={}) is False
