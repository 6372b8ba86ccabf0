"""Real two-process jax.distributed encode (VERDICT round 1, item 6).

Launches two OS processes that each call jax.distributed.initialize against
a localhost coordinator, encode their assign_gops span of the same video
into a shared checkpoint dir, barrier, and process 0 assembles the
container. The decode must be identical to a single-host encode.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIDEO = "/root/reference/videos/cat_short.mp4"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_encode(tmp_path):
    if not os.path.exists(VIDEO):
        pytest.skip("video unavailable")
    port = _free_port()
    out = str(tmp_path / "dist.npz")
    ck = str(tmp_path / "ck")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # subprocesses need no virtual devices
    # The shared persistent compilation cache (conftest) must NOT reach
    # multi-process jax.distributed ranks: XLA bakes collective instance
    # keys into compiled CPU executables, and a rank loading a cached
    # executable while its peer compiles fresh (or loads one cached from a
    # different compile order) desynchronizes the Gloo rendezvous keys —
    # observed as "Gloo context initialization failed: Connect timeout /
    # GetKeyValue() timed out" at the final sync_global_devices. Cold
    # compiles in both ranks always agree.
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "vcs_h264_tpu.cli", "encode", VIDEO,
             "-o", out, "--procs", "2", "--proc-id", str(i),
             "--coordinator", f"localhost:{port}", "--platform", "cpu",
             "--checkpoint-dir", ck, "--max-frames", "8"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        outputs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(outputs)
    # both processes actually initialized jax.distributed and encoded a span
    joined = "\n".join(outputs)
    assert "[proc 0/2]" in joined and "[proc 1/2]" in joined, joined
    assert len(os.listdir(ck)) == 2            # one checkpoint per GOP

    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.models.gop import EncodedVideo
    got = Decoder().decode(EncodedVideo.load_npz(out))

    from vcs_h264_tpu.io.video import VideoReader
    frames = VideoReader(VIDEO, block_multiple=8, max_frames=8).read_all()
    want_video = Encoder(CodecConfig()).encode_frames(frames)
    want = Decoder().decode(want_video)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_two_process_distributed_encode_420(tmp_path):
    """The 2-process jax.distributed path x the 4:2:0 mode (VERDICT r3
    Next #9): per-process GOP spans, shared checkpoint dir, assembled .vcs
    container decodes identically to a single-host 4:2:0 encode."""
    if not os.path.exists(VIDEO):
        pytest.skip("video unavailable")
    port = _free_port()
    out = str(tmp_path / "dist420.vcs")
    ck = str(tmp_path / "ck420")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "vcs_h264_tpu.cli", "encode", VIDEO,
             "-o", out, "--procs", "2", "--proc-id", str(i),
             "--coordinator", f"localhost:{port}", "--platform", "cpu",
             "--chroma-420", "--intra-qstep", "24",
             "--checkpoint-dir", ck, "--max-frames", "8"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        outputs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(outputs)
    joined = "\n".join(outputs)
    assert "[proc 0/2]" in joined and "[proc 1/2]" in joined, joined
    assert len(os.listdir(ck)) == 2

    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.io.bitstream import load_vcs
    got = Decoder().decode(load_vcs(out))

    from vcs_h264_tpu.io.video import VideoReader
    cfg = CodecConfig(quant_mode="rounded", chroma_420=True, intra_i=True,
                      intra_qstep=24)
    frames = VideoReader(VIDEO, block_multiple=16, max_frames=8).read_all()
    want = Decoder().decode(Encoder(cfg).encode_frames(frames))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
