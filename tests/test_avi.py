"""MJPEG-AVI writer (utils/avi.py): container structure, decodability of
every frame, and the save_video fallback wiring (the env has no ffmpeg, so
this IS the shipped video path — reference writes mp4 via imageio-ffmpeg,
utils/loop_merge_utils.py:35)."""

import io
import struct

import numpy as np
import pytest

from dynamicscaler_tpu.utils.avi import read_avi_info, write_mjpeg_avi


def _frames(n=5, h=48, w=64):
    # smooth gradients (JPEG reconstructs these well; noise wouldn't be a
    # fair roundtrip target)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (h + w)],
                    -1).astype(np.uint8)
    return [np.roll(base, i * 3, axis=1) for i in range(n)]


def test_container_structure(tmp_path):
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, _frames(), fps=8)
    info = read_avi_info(path)
    assert info == {
        "frames": 5, "fps": 8, "width": 64, "height": 48,
        "has_index": True, "index_entries": 5,
    }
    with open(path, "rb") as f:
        data = f.read()
    # RIFF size field must cover the whole file
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size + 8 == len(data)


def test_frames_decode_back(tmp_path):
    from PIL import Image

    frames = _frames(n=3)
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, frames, fps=4, quality=95)
    with open(path, "rb") as f:
        data = f.read()
    # walk the movi chunks and decode each JPEG payload
    movi = data.index(b"movi")
    pos = movi + 4
    decoded = []
    while data[pos : pos + 4] == b"00dc":
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        decoded.append(np.asarray(Image.open(io.BytesIO(payload)).convert("RGB")))
        pos += 8 + size + (size % 2)
    assert len(decoded) == 3
    for got, ref in zip(decoded, frames):
        assert got.shape == ref.shape
        # JPEG q=95 reconstruction error stays small
        assert np.abs(got.astype(int) - ref.astype(int)).mean() < 8


def test_imageio_reads_it_back(tmp_path):
    """imageio's pillow plugin can't read AVI, but ffmpeg-less imageio still
    exposes the raw file; only run the decode when a video backend exists."""
    imageio = pytest.importorskip("imageio")
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, _frames(n=2), fps=2)
    try:
        rd = imageio.get_reader(path)
        assert len(list(rd)) == 2
    except Exception:
        pytest.skip("no AVI-capable imageio backend in this env")


def test_save_video_fallback_writes_avi(tmp_path):
    from dynamicscaler_tpu.utils.io import save_video

    video = np.random.default_rng(0).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    saved = save_video(video, str(tmp_path), "clip", fps=4)
    assert saved is not None
    if saved.endswith(".mp4"):  # an ffmpeg backend exists here after all
        return
    assert saved.endswith(".avi")
    info = read_avi_info(saved)
    assert info["frames"] == 3 and info["width"] == 32
    assert (tmp_path / "clip_frames" / "0000.png").exists()


def test_read_mjpeg_avi_roundtrip(tmp_path):
    """Native decode path (read_mjpeg_avi) — the env-independent video
    READ that closes the 'decode paths env-untested' gap."""
    from dynamicscaler_tpu.utils.avi import read_mjpeg_avi

    frames = _frames(n=4)
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, frames, fps=6, quality=95)
    got, fps = read_mjpeg_avi(path)
    assert fps == 6 and got.shape == (4, 48, 64, 3) and got.dtype == np.uint8
    for g, ref in zip(got, frames):
        assert np.abs(g.astype(int) - ref.astype(int)).mean() < 8


def test_load_video_batch(tmp_path):
    """funcs.py:118-155 semantics: stride selection, -1 = all frames,
    repeat-pad when too short, resize, fps list."""
    from dynamicscaler_tpu.utils.io import load_video_batch

    frames = _frames(n=7)
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, frames, fps=8, quality=95)

    batch, fps = load_video_batch([path, path], frame_stride=2,
                                  video_size=(24, 32), video_frames=3)
    assert batch.shape == (2, 3, 24, 32, 3) and fps == [4, 4]
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    # stride=2 picks source frames 0,2,4 — frame 1 of the batch must match
    # source frame 2, not source frame 1
    from PIL import Image
    ref2 = np.asarray(Image.fromarray(frames[2]).resize((32, 24), Image.BILINEAR))
    ref1 = np.asarray(Image.fromarray(frames[1]).resize((32, 24), Image.BILINEAR))
    got1 = ((batch[0, 1] / 2 + 0.5) * 255)
    assert np.abs(got1 - ref2).mean() < 8
    assert np.abs(got1 - ref2).mean() < np.abs(got1 - ref1).mean()

    # video_frames=-1: ALL frames at fs=1 regardless of the passed stride
    batch, fps = load_video_batch([path], frame_stride=3,
                                  video_size=(48, 64), video_frames=-1)
    assert batch.shape == (1, 7, 48, 64, 3) and fps == [8]

    # too short: 7 source frames, stride 2 -> 4 valid, pad to 6 repeating
    # the last
    batch, _ = load_video_batch([path], frame_stride=2,
                                video_size=(48, 64), video_frames=6)
    assert batch.shape == (1, 6, 48, 64, 3)
    np.testing.assert_array_equal(batch[0, 4], batch[0, 3])
    np.testing.assert_array_equal(batch[0, 5], batch[0, 3])


def test_load_first_frame_native_avi(tmp_path):
    from dynamicscaler_tpu.utils.io import load_first_frame

    frames = _frames(n=2)
    path = str(tmp_path / "clip.avi")
    write_mjpeg_avi(path, frames, fps=4, quality=95)
    got = load_first_frame(path, 48, 64)
    assert got.shape == (48, 64, 3)
    ref = (frames[0].astype(np.float32) / 255.0 - 0.5) * 2
    assert np.abs(got - ref).mean() < 0.07
