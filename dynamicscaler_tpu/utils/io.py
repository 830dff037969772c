"""Host-side image/video IO (not on the accelerator).

Reference: utils/tensor_utils.py:7-16 (image load), utils/loop_merge_utils.py
(mp4 save), pipeline `_load_imgs_from_paths`. PIL replaces cv2 for resizing
(bilinear; visually identical).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from PIL import Image


def load_image(path: str, height: int, width: int, norm_to_1: bool = True) -> np.ndarray:
    """Load an image as float32 [H, W, 3]; range [-1, 1] when norm_to_1."""
    img = Image.open(path).convert("RGB")
    img = img.resize((width, height), Image.BILINEAR)
    arr = np.asarray(img, np.float32)
    if norm_to_1:
        arr = (arr / 255.0 - 0.5) * 2
    return arr


def load_first_frame(path: str, height: int, width: int) -> np.ndarray:
    """First frame of a video file (or an image) as float32 [H, W, 3] in
    [-1, 1] — the reference's decord mp4 branch of ``load_image_batch``
    (scripts/evaluation/funcs.py:156-167). decord is absent here; video
    files go through imageio, which needs an ffmpeg/pyav backend — a clear
    error names the missing plugin when none is installed."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".mp4", ".avi", ".mov", ".webm", ".mkv"):
        if ext == ".avi":
            try:  # native MJPEG-AVI decode, no ffmpeg needed
                from dynamicscaler_tpu.utils.avi import read_mjpeg_avi

                frame = read_mjpeg_avi(path)[0][0]
                img = Image.fromarray(frame).convert("RGB").resize(
                    (width, height), Image.BILINEAR
                )
                return (np.asarray(img, np.float32) / 255.0 - 0.5) * 2
            except Exception:
                pass  # not MJPEG: fall through to imageio
        try:
            import imageio.v3 as iio

            frame = iio.imread(path, index=0)
        except Exception as e:  # no ffmpeg/pyav in this environment
            raise RuntimeError(
                f"reading video conditioning {path!r} requires an imageio "
                f"video backend (ffmpeg or pyav), unavailable here: {e}"
            ) from e
        img = Image.fromarray(frame).convert("RGB").resize(
            (width, height), Image.BILINEAR
        )
        return (np.asarray(img, np.float32) / 255.0 - 0.5) * 2
    return load_image(path, height, width)


def _read_video_frames(path: str):
    """All frames of a video file as (uint8 [T, H, W, 3], fps). MJPEG AVIs
    decode natively (utils/avi.read_mjpeg_avi — no ffmpeg needed); other
    containers go through imageio and need an ffmpeg/pyav backend."""
    if os.path.splitext(path)[1].lower() == ".avi":
        try:
            from dynamicscaler_tpu.utils.avi import read_mjpeg_avi

            return read_mjpeg_avi(path)
        except Exception:
            pass  # not MJPEG / truncated: fall through to imageio
    try:
        import imageio.v3 as iio

        frames = np.asarray(iio.imread(path))
        fps = float(iio.immeta(path).get("fps", 8))
    except Exception as e:
        raise RuntimeError(
            f"reading video {path!r} requires an imageio video backend "
            f"(ffmpeg or pyav), unavailable here: {e}"
        ) from e
    return frames, fps


def load_video_batch(filepath_list, frame_stride: int, video_size=(256, 256),
                     video_frames: int = 16):
    """Multi-frame video loading with ``frame_stride`` — the reference's
    ``load_video_batch`` (scripts/evaluation/funcs.py:118-155, decord):
    every ``frame_stride``-th frame, ``video_frames=-1`` takes ALL frames
    (forcing fs=1), too-short videos repeat-pad the last frame. Returns
    ``(batch [B, F, H, W, 3] float32 in [-1, 1], fps_list)`` — frames on
    axis 1 (this repo's layout; the reference permutes to [B,C,T,H,W]),
    and the per-video ``int(fps / frame_stride)`` list the reference
    computes but drops (:152-153)."""
    assert frame_stride > 0, "valid frame stride should be a positive integer"
    batch, fps_list = [], []
    for path in filepath_list:
        frames, fps = _read_video_frames(path)
        total = frames.shape[0]
        fs = frame_stride
        if video_frames < 0:
            required, fs = total, 1
        else:
            required = video_frames
        max_valid = (total - 1) // fs + 1
        take = min(required, max_valid)
        idx = [fs * i for i in range(take)]
        sel = frames[idx]
        h, w = video_size
        if sel.shape[1:3] != (h, w):
            sel = np.stack(
                [np.asarray(Image.fromarray(f).resize((w, h), Image.BILINEAR)) for f in sel]
            )
        clip = (sel.astype(np.float32) / 255.0 - 0.5) * 2
        if take < required:  # repeat-pad the last frame (funcs.py:146-149)
            pad = np.repeat(clip[-1:], required - take, axis=0)
            clip = np.concatenate([clip, pad], axis=0)
        batch.append(clip)
        fps_list.append(int(fps / fs))
    return np.stack(batch), fps_list


def to_uint8_frames(video: np.ndarray) -> np.ndarray:
    """[F, H, W, 3] float in [-1, 1] -> uint8 (no-op if already uint8)."""
    if video.dtype == np.uint8:
        return video
    v = np.clip(video, -1.0, 1.0)
    v = ((v + 1.0) / 2.0 * 255.0).astype(np.uint8)
    return v


def to_uint8_device(video):
    """Device-side [-1,1] -> uint8 conversion. Readback of a decoded
    panorama video through the remote-TPU tunnel moves 4x fewer bytes as
    uint8 (a 16-frame 2048x1024 clip is 400 MB as fp32)."""
    import jax.numpy as jnp

    v = jnp.clip(video, -1.0, 1.0)
    return ((v + 1.0) / 2.0 * 255.0).astype(jnp.uint8)


def save_video(video: np.ndarray, output_path: str, output_name: str, fps: int = 16,
               save_mp4: bool = True, save_gif: bool = False,
               gif_max_width: int = 1024) -> Optional[str]:
    """[F, H, W, 3] in [-1, 1] -> mp4 (and/or gif) via imageio
    (utils/loop_merge_utils.py:22-36).

    Without an ffmpeg backend the fallback writes a REAL video file anyway —
    a dependency-free MJPEG AVI (utils/avi.py, full-quality JPEG frames,
    plays everywhere) — plus full-res PNG frames (parallel, low compression
    — PIL releases the GIL) and optionally a preview gif downscaled to
    ``gif_max_width`` (gif palette quantization at 2048-wide panorama
    frames cost ~90s of host time per save otherwise)."""
    os.makedirs(output_path, exist_ok=True)
    frames = list(to_uint8_frames(video))
    saved = None
    import imageio

    if save_mp4:
        try:
            saved = os.path.join(output_path, f"{output_name}.mp4")
            imageio.mimsave(saved, frames, fps=fps)
        except Exception as e:  # no ffmpeg backend in this environment
            print(f"[save_video] mp4 backend unavailable ({e}); "
                  f"writing mjpeg-avi + frames")
            from dynamicscaler_tpu.utils.avi import write_mjpeg_avi

            saved = write_mjpeg_avi(
                os.path.join(output_path, f"{output_name}.avi"), frames, fps=fps
            )
            frames_dir = os.path.join(output_path, f"{output_name}_frames")
            os.makedirs(frames_dir, exist_ok=True)
            from concurrent.futures import ThreadPoolExecutor

            def _write(iframe):
                i, fr = iframe
                Image.fromarray(fr).save(
                    os.path.join(frames_dir, f"{i:04d}.png"), compress_level=1
                )

            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(_write, enumerate(frames)))
    if save_gif:
        # resize + palette-quantize per frame on a thread pool (PIL releases
        # the GIL), then assemble with PIL directly — imageio's writer
        # quantizes serially (~20-30s for 16 1024-wide frames)
        from concurrent.futures import ThreadPoolExecutor

        def _prep(fr):
            im = Image.fromarray(fr)
            if im.width > gif_max_width:
                im = im.resize(
                    (gif_max_width, int(im.height * gif_max_width / im.width)),
                    Image.BILINEAR,
                )
            # FASTOCTREE is O(pixels); MEDIANCUT histograms every distinct
            # color (minutes on high-entropy frames)
            return im.quantize(colors=256, method=Image.FASTOCTREE)

        with ThreadPoolExecutor(max_workers=8) as pool:
            gif_frames = list(pool.map(_prep, frames))
        gif = os.path.join(output_path, f"{output_name}.gif")
        gif_frames[0].save(
            gif, save_all=True, append_images=gif_frames[1:],
            duration=int(1000.0 / fps), loop=0,
        )
        saved = saved or gif
    return saved


def save_latent(latent, path: str):
    """Stage checkpoint: save a latent as .npy (resume artifact, the
    reference torch.save's latents, gen_pano_360.py:275,326,390)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(latent))


def load_latent(path: str) -> np.ndarray:
    return np.load(path)
