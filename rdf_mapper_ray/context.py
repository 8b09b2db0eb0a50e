"""Engine-wide Ray Data context defaults.

Applied once at package import (workers inherit the driver's context):

* **push-based sort shuffle** — the pull-based default makes every
  reduce task fetch one tiny object per map task (an O(maps x reduces)
  IPC storm that serialised our dedup merge phase: measured 2.5-3x
  end-to-end on the flagship pipeline at 32 cpus);
* nothing else — batch sizes, block sizes and parallelism are chosen
  per stage by the pipelines themselves.

This module must NOT call ``ray.init()`` (driver contract).
"""

from __future__ import annotations


def configure_data_context() -> None:
    try:
        import ray.data
        from ray.data.context import ShuffleStrategy
    except ImportError:  # pragma: no cover
        return
    ctx = ray.data.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    # 16 MiB blocks, not the 128 MiB I/O-oriented default: per-row
    # template extraction is CPU-bound, and a single 60 MB block from a
    # one-row-group file otherwise serialises the whole extract into one
    # task (parallelism == block count in Ray Data).
    ctx.target_max_block_size = 16 << 20
