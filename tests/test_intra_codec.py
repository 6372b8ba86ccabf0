"""Lossless intra coding of I-frames + container integration + size win."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vcs_h264_tpu.models.intra_codec import (encode_intra_frame,
                                             decode_intra_frame)


def test_intra_frame_roundtrip_random(rng):
    planes = jnp.asarray(rng.integers(0, 256, (3, 32, 48)), jnp.int32)
    back = decode_intra_frame(encode_intra_frame(planes))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(planes))


def test_intra_frame_roundtrip_real():
    import cv2
    img = cv2.imread("/root/reference/images/happy-corgi.jpg")
    if img is None:
        pytest.skip("image unavailable")
    img = img[:128, :160]
    planes = jnp.asarray(img.transpose(2, 0, 1), jnp.int32)
    back = decode_intra_frame(encode_intra_frame(planes))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(planes))


def test_vcs_intra_i_frames_lossless_and_smaller(tmp_path):
    import cv2
    from vcs_h264_tpu.config import CodecConfig
    from vcs_h264_tpu.models import Encoder, Decoder
    from vcs_h264_tpu.io.bitstream import save_vcs, load_vcs
    cap = cv2.VideoCapture("/root/reference/videos/cat_short.mp4")
    frames = []
    while len(frames) < 8:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f[:256, :256])
    cap.release()
    if len(frames) < 8:
        pytest.skip("video unavailable")

    cfg_raw = CodecConfig.production(intra_i=False)
    cfg_intra = CodecConfig.production()
    v_raw = Encoder(cfg_raw, gop_batch=2).encode_frames(frames)
    v_intra = Encoder(cfg_intra, gop_batch=2).encode_frames(frames)
    p_raw = str(tmp_path / "raw.vcs")
    p_intra = str(tmp_path / "intra.vcs")
    save_vcs(v_raw, p_raw)
    save_vcs(v_intra, p_intra)

    # decode bit-identical (intra coding is lossless)
    d_raw = Decoder().decode(load_vcs(p_raw))
    d_intra = Decoder().decode(load_vcs(p_intra))
    for a, b in zip(d_raw, d_intra):
        np.testing.assert_array_equal(a, b)

    s_raw = os.path.getsize(p_raw)
    s_intra = os.path.getsize(p_intra)
    assert s_intra < s_raw, (s_intra, s_raw)
    print(f"container: raw-I {s_raw} -> intra-I {s_intra} "
          f"({s_raw / s_intra:.2f}x)")
