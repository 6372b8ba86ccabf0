"""Multi-host distribution (SURVEY.md §2.3 / §5 plans).

The scaling axes over DCN are GOPs: every GOP is independent (its P-frames
reference only its own I-frame, encoder.py:51), so hosts ingest and encode
disjoint GOP ranges and the encoded artifacts are gathered (or simply written
per-host — the .vcs/.npz containers concatenate by GOP index, and per-GOP
checkpoint files double as the gather medium + failure-recovery unit).

Within a host/slice, the (gop x tile) mesh of parallel/mesh.py applies; ICI
carries the tile-halo ppermutes, DCN only ever carries encoded artifacts.

This module is exercised logically in tests (assignment/merge) and via
jax.distributed on real pods; single-host environments skip initialize.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when configured; returns
    (process_id, num_processes). No-op single-host fallback."""
    import jax
    coord = coordinator_address or os.environ.get("VCS_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num_processes or int(os.environ["VCS_NUM_PROCS"]),
            process_id=process_id if process_id is not None
            else int(os.environ["VCS_PROC_ID"]))
        return jax.process_index(), jax.process_count()
    return 0, 1


def process_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """All-process barrier over the coordination service (control plane).

    The encode flow only needs a barrier for FILESYSTEM visibility (every
    rank's checkpoints durably written before rank 0 assembles), so the
    right primitive is the coordinator's wait_at_barrier — plain RPCs to
    the coordinator — not a device collective. The previous
    multihost_utils.sync_global_devices barrier ran a Gloo CPU allgather,
    whose TCP rendezvous proved timing-sensitive on single-host CPU runs
    (ranks intermittently disagree on the Gloo context index and deadlock
    at "GetKeyValue timed out" / "Connect timeout"); it remains as the
    fallback when the coordination-service client API is unavailable.
    No-op when jax.distributed was never initialized (single process)."""
    import jax
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed as _dist
        client = getattr(_dist.global_state, "client", None)
    except Exception:
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def assign_gops(num_gops: int, num_processes: int,
                process_id: int) -> List[int]:
    """Contiguous block assignment of GOP indices to a host.

    Contiguous (not round-robin) so each host reads one contiguous span of
    the source video — sequential cv2 decoding, no seek storms."""
    base = num_gops // num_processes
    extra = num_gops % num_processes
    start = process_id * base + min(process_id, extra)
    count = base + (1 if process_id < extra else 0)
    return list(range(start, start + count))


def frame_range_for_gops(gop_indices: Sequence[int], gop_len: int,
                         num_frames: int) -> Tuple[int, int]:
    """[first_frame, last_frame) covering a contiguous GOP assignment."""
    if not gop_indices:
        return 0, 0
    lo = min(gop_indices) * gop_len
    hi = min((max(gop_indices) + 1) * gop_len, num_frames)
    return lo, hi


def merge_checkpoint_dirs(dirs: Sequence[str], out_dir: str) -> int:
    """Merge per-host checkpoint directories (the DCN 'gather'): hard-link or
    copy every gop_*.npz into one directory; returns GOP count."""
    import shutil
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for d in dirs:
        for name in sorted(os.listdir(d)):
            if not name.startswith("gop_"):
                continue
            dst = os.path.join(out_dir, name)
            if not os.path.exists(dst):
                try:
                    os.link(os.path.join(d, name), dst)
                except OSError:
                    shutil.copy2(os.path.join(d, name), dst)
            n += 1
    return n
