"""Generate legacy .vcs container fixtures for versions 3-9 (ADVICE r4).

For each container version, checks out the commit that WROTE that version
into a temporary git worktree, encodes a tiny deterministic video with that
era's own Encoder + save_vcs, decodes it with that era's own Decoder, and
stores both the .vcs bytes and the decoded frames under tests/fixtures/.

tests/test_bitstream.py::test_legacy_vcs_versions_load then loads each
fixture with the CURRENT loader and asserts the current decode reproduces
the era's own decoded frames exactly — pinning every legacy parse path
(v3-v7 field ordering, itype derivation for v<5, B-sections for v>=4/v>=7,
pre-CBF entropy coders) against a stored artifact.

Run from the repo root:  python tools/gen_legacy_fixtures.py
(regeneration is only needed if fixtures are lost; the fixtures are
checked in).
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")

# (version, commit that wrote it, config expression exercising its features)
ERAS = [
    (3, "c859c38", "CodecConfig.production()"),
    (4, "ac4184a",
     "CodecConfig.production(gop_pattern=('I', 'B', 'P', 'B', 'P'))"),
    (5, "8b50572", "CodecConfig.production(intra_qstep=16)"),
    (6, "81837f3",
     "CodecConfig(quant_mode='rounded', chroma_420=True, intra_i=True, "
     "intra_qstep=24)"),
    (7, "cd949fd",
     "CodecConfig(quant_mode='rounded', chroma_420=True, intra_i=True, "
     "intra_qstep=24, gop_pattern=('I', 'B', 'P', 'B', 'P'))"),
    (8, "aa045c6", "CodecConfig.production(intra_qstep=16)"),
    (9, "0b67c4a",
     "CodecConfig.production(intra_qstep=16, "
     "gop_pattern=('I', 'B', 'P', 'B', 'P'))"),
    (10, "6d6b15c", "CodecConfig.production(intra_qstep=16)"),
]

GEN = r"""
import os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
# match tests/conftest.py's env: float rounding at exact .5 ties can differ
# between XLA CPU compilations with different device counts (ADVICE r4 #2)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
sys.path.insert(0, os.getcwd())
from vcs_h264_tpu.config import CodecConfig
from vcs_h264_tpu.models import Encoder, Decoder
from vcs_h264_tpu.io import bitstream as bs

cfg = eval(sys.argv[1])
out_vcs, out_npz = sys.argv[2], sys.argv[3]
rng = np.random.default_rng(7)
base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
frames = [np.roll(base, (t, 2 * t), axis=(0, 1)) for t in range(10)]
video = Encoder(cfg, gop_batch=2).encode_frames(frames)
bs.save_vcs(video, out_vcs)
dec = Decoder().decode(bs.load_vcs(out_vcs))
np.savez_compressed(out_npz, **{f"f{i}": f for i, f in enumerate(dec)})
print("wrote", out_vcs, os.path.getsize(out_vcs), "bytes")
"""


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    for version, commit, cfg_expr in ERAS:
        out_vcs = os.path.join(FIXDIR, f"legacy_v{version}.vcs")
        out_npz = os.path.join(FIXDIR, f"legacy_v{version}_frames.npz")
        with tempfile.TemporaryDirectory(prefix=f"legacy_v{version}_") as wt:
            wtdir = os.path.join(wt, "src")
            subprocess.run(["git", "worktree", "add", "--detach", wtdir,
                            commit], cwd=REPO, check=True,
                           capture_output=True)
            try:
                r = subprocess.run(
                    [sys.executable, "-c", GEN, cfg_expr, out_vcs, out_npz],
                    cwd=wtdir, capture_output=True, text=True, timeout=900)
                if r.returncode != 0:
                    print(f"v{version} ({commit}) FAILED:\n{r.stdout}"
                          f"\n{r.stderr}", file=sys.stderr)
                    sys.exit(1)
                print(f"v{version}: {r.stdout.strip()}")
            finally:
                subprocess.run(["git", "worktree", "remove", "--force",
                                wtdir], cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
