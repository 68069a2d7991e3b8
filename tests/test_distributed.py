"""Distributed scaffolding tests (single-process configuration)."""

from cut_detection_tpu.parallel.distributed import initialize, partition_inputs


def test_initialize_single_process_noop():
    assert initialize() == 0
    assert initialize() == 0  # idempotent


def test_partition_inputs_round_robin():
    items = list(range(10))
    shards = [partition_inputs(items, process_id=p, num_processes=3)
              for p in range(3)]
    assert shards[0] == [0, 3, 6, 9]
    assert shards[1] == [1, 4, 7]
    assert shards[2] == [2, 5, 8]
    flat = sorted(x for s in shards for x in s)
    assert flat == items


def test_partition_inputs_defaults_to_local():
    items = ["a", "b"]
    assert partition_inputs(items) == items  # single process owns all
