"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without a pod (SURVEY.md §4 item 5). Env must be set before the
first jax import.
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the axon TPU-tunnel
# sitecustomize re-registers itself and sets jax_platforms="axon,cpu" at
# import time, so the env var alone is not enough — override the config
# after import, before any backend is initialized).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent (on-disk) XLA compilation cache shared by the suite's test
# processes. The per-module clear_caches() below bounds the LIVE executable
# set (the root trigger of the late-suite aborts); this cache makes the
# resulting recompiles of identical programs across modules and xdist
# workers cheap disk hits instead of fresh XLA runs. Measured: 32 min
# (round-4 serial, no cache) -> ~20-26 min cold / **~4-6 min warm** with
# two xdist workers. The dir is repo-local and gitignored; a cold run
# warms it for the next. NOT inherited by the jax.distributed subprocess
# tests — XLA bakes collective instance keys into cached CPU executables,
# which desynchronizes Gloo rendezvous across independently-compiled
# ranks (see test_distributed_2proc.py).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_test_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of CPU XLA programs; by the time it
    reaches the late modules the accumulated executables + buffers
    intermittently abort/segfault fresh compiles (observed twice at
    tests/test_rd_points.py when run after the whole suite; every module
    passes standalone). Bounding the live set per module fixes it at the
    cost of some recompilation (module-level sharing is minimal anyway).
    The repo-level jit wrappers cache by function identity, so their
    lru_caches are also cleared to drop references."""
    yield
    import jax
    from vcs_h264_tpu.models import pipeline
    for fn in (pipeline.jit_encode_gop, pipeline.jit_decode_gop,
               pipeline.jit_encode_gop_batch, pipeline.jit_decode_gop_batch,
               pipeline.jit_decode_gop_batch_u8, pipeline.jit_decode_gop_u8):
        fn.cache_clear()
    try:
        from vcs_h264_tpu.models import pipeline420
        pipeline420.jit_encode_gop_batch_420.cache_clear()
        pipeline420.jit_decode_gop_batch_420_u8.cache_clear()
    except Exception:
        pass
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def load_test_frames(path, count, stride=1):
    """Host-side frame grab from the reference's media assets."""
    import cv2
    cap = cv2.VideoCapture(path)
    frames = []
    i = 0
    while len(frames) < count:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            frames.append(frame)
        i += 1
    cap.release()
    return frames
