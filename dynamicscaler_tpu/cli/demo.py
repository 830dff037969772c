"""Interactive generation demo — the gradio demos' equivalent.

The reference ships gradio apps wrapping a ``Text2Video``/``Image2Video``
class with a ``get_prompt(...)`` entry (scripts/gradio/t2v_test.py:9-61,
i2v_test.py). gradio isn't available here, so the same surface is served
two ways:

* :class:`Text2Video` / :class:`Image2Video` — the programmatic demo
  classes (same role as the reference's, minus the hub download);
* ``python -m dynamicscaler_tpu.cli.demo --port 7860`` — a dependency-free
  stdlib HTTP app: prompt form -> generate -> inline animation preview
  (gif; mp4 when ffmpeg exists).

``--dev_tiny`` serves a tiny random model for asset-free smoke runs.
"""

from __future__ import annotations

import argparse
import base64
import html
import io
import json
import os
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class Text2Video:
    """Programmatic t2v demo (reference Text2Video.get_prompt,
    scripts/gradio/t2v_test.py:32-61)."""

    def __init__(self, model, result_dir="./tmp/demo"):
        self.model = model
        self.result_dir = result_dir
        os.makedirs(result_dir, exist_ok=True)
        self.save_fps = 8

    def get_prompt(self, prompt, steps=48, cfg_scale=12.0, fps=16, seed=123,
                   height=320, width=512):
        import jax

        from dynamicscaler_tpu.pipelines import t2v
        from dynamicscaler_tpu.utils.io import save_video

        steps = min(int(steps), 60)  # reference clamps to 60 (:36-37)
        t0 = time.time()
        video, _ = t2v.basic_sample(
            self.model, prompt, height=height, width=width,
            guidance_scale=float(cfg_scale),
            frames=self.model.config.unet.temporal_length,
            num_inference_steps=steps, fps=int(fps),
            key=jax.random.PRNGKey(int(seed)),
        )
        name = "".join(c if c.isalnum() else "_" for c in prompt[:30]) or "out"
        path = save_video(np.asarray(video[0]), self.result_dir, name,
                          fps=self.save_fps, save_gif=True)
        print(f"[demo] '{prompt[:40]}' done in {time.time() - t0:.1f}s -> {path}")
        return path


class Image2Video:
    """Programmatic i2v demo (reference Image2Video, scripts/gradio/i2v_test.py)."""

    def __init__(self, model, result_dir="./tmp/demo"):
        self.model = model
        self.result_dir = result_dir
        os.makedirs(result_dir, exist_ok=True)
        self.save_fps = 8

    def get_image(self, image, prompt, steps=48, cfg_scale=12.0, fps=16,
                  seed=123, height=320, width=512):
        """image: [H, W, 3] float in [-1, 1] or uint8."""
        import jax

        from dynamicscaler_tpu.pipelines import i2v
        from dynamicscaler_tpu.utils.io import save_video

        if image.dtype == np.uint8:
            image = (image.astype(np.float32) / 255.0 - 0.5) * 2
        steps = min(int(steps), 60)
        video, _ = i2v.basic_sample(
            self.model, prompt, image, height=height, width=width,
            guidance_scale=float(cfg_scale),
            frames=self.model.config.unet.temporal_length,
            num_inference_steps=steps, fps=int(fps),
            key=jax.random.PRNGKey(int(seed)),
        )
        name = "".join(c if c.isalnum() else "_" for c in prompt[:30]) or "out"
        path = save_video(np.asarray(video[0]), self.result_dir, name,
                          fps=self.save_fps, save_gif=True)
        return path


_I2V_FORM = """<h3>Image → video (scripts/gradio/i2v_test.py)</h3>
<form method="post" action="/generate_i2v" enctype="multipart/form-data">
<label>Image <input name="image" type="file" accept="image/*" required></label>
<label>Prompt <input name="prompt" size="60" value="a black swan swims on the pond"></label>
<label>Steps <input name="steps" type="number" value="{steps}" min="1" max="60"></label>
<label>CFG scale <input name="cfg" type="number" step="0.5" value="12.0"></label>
<label>Seed <input name="seed" type="number" value="123"></label>
<button type="submit">Generate from image</button>
</form>"""

_PAGE = """<!doctype html><html><head><title>dynamicscaler_tpu demo</title>
<style>body{{font-family:sans-serif;max-width:720px;margin:2em auto}}
input,select{{margin:0.2em 0}}label{{display:block;margin-top:0.6em}}</style>
</head><body>
<h2>DynamicScaler TPU — generation demo</h2>
<h3>Text → video</h3>
<form method="post" action="/generate">
<label>Prompt <input name="prompt" size="60" value="a black swan swims on the pond"></label>
<label>Steps <input name="steps" type="number" value="{steps}" min="1" max="60"></label>
<label>CFG scale <input name="cfg" type="number" step="0.5" value="12.0"></label>
<label>Seed <input name="seed" type="number" value="123"></label>
<button type="submit">Generate</button>
</form>
{i2v_form}
{result}
</body></html>"""


def _parse_multipart(headers, body: bytes):
    """Minimal multipart/form-data parser (stdlib email; cgi is removed in
    new Pythons). Returns {field: bytes-or-str}."""
    from email.parser import BytesParser
    from email.policy import default as default_policy

    msg = BytesParser(policy=default_policy).parsebytes(
        b"Content-Type: " + headers.get("Content-Type", "").encode() + b"\r\n\r\n" + body
    )
    fields = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if not name:
            continue
        payload = part.get_payload(decode=True)
        if part.get_filename():
            fields[name] = payload  # file field stays bytes
        else:
            fields[name] = payload.decode(errors="replace")
    return fields


def _build_handler(t2v_demo, defaults, i2v_demo=None):
    # the single chip can't run two sampling programs concurrently without
    # HBM contention — serialize generation, reply 503 when busy (ADVICE r2)
    gen_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, body: str, code=200):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

        def _page(self, result=""):
            i2v_form = _I2V_FORM.format(**defaults) if i2v_demo is not None else ""
            return _PAGE.format(result=result, i2v_form=i2v_form, **defaults)

        def do_GET(self):
            self._send(self._page())

        def _result_html(self, prompt, path):
            # inline the animation (gif fallback path is always embeddable)
            gif = path if path.endswith(".gif") else os.path.splitext(path)[0] + ".gif"
            show = gif if os.path.exists(gif) else path
            with open(show, "rb") as f:
                b64 = base64.b64encode(f.read()).decode()
            mime = "image/gif" if show.endswith(".gif") else "video/mp4"
            tag = (
                f'<img src="data:{mime};base64,{b64}">'
                if mime == "image/gif"
                else f'<video controls autoplay loop src="data:{mime};base64,{b64}"></video>'
            )
            return f"<h3>{html.escape(prompt)}</h3>{tag}<p>{html.escape(show)}</p>"

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            if not gen_lock.acquire(blocking=False):
                self._send(self._page("<p>Busy: a generation is already "
                                      "running; retry when it finishes.</p>"), 503)
                return
            try:
                if self.path == "/generate_i2v" and i2v_demo is not None:
                    fields = _parse_multipart(self.headers, body)
                    prompt = str(fields.get("prompt", "a black swan"))
                    img_bytes = fields.get("image")
                    if not img_bytes:
                        self._send(self._page("<p>No image uploaded.</p>"), 400)
                        return
                    from PIL import Image

                    img = np.asarray(
                        Image.open(io.BytesIO(img_bytes)).convert("RGB")
                    )
                    path = i2v_demo.get_image(
                        img, prompt,
                        steps=int(fields.get("steps", defaults["steps"])),
                        cfg_scale=float(fields.get("cfg", 12.0)),
                        seed=int(fields.get("seed", 123)),
                        height=defaults["height"], width=defaults["width"],
                    )
                else:
                    form = urllib.parse.parse_qs(body.decode())
                    prompt = form.get("prompt", ["a black swan"])[0]
                    path = t2v_demo.get_prompt(
                        prompt,
                        steps=int(form.get("steps", [defaults["steps"]])[0]),
                        cfg_scale=float(form.get("cfg", [12.0])[0]),
                        seed=int(form.get("seed", [123])[0]),
                        height=defaults["height"], width=defaults["width"],
                    )
            finally:
                gen_lock.release()
            self._send(self._page(self._result_html(prompt, path)))

    return Handler


def make_server(model, port=0, result_dir="./tmp/demo", defaults=None):
    """ThreadingHTTPServer serving the demo; port 0 picks a free port.
    Image-conditioned models additionally get the i2v upload form."""
    defaults = defaults or {"steps": 48, "height": 320, "width": 512}
    demo = Text2Video(model, result_dir=result_dir)
    i2v_demo = (
        Image2Video(model, result_dir=result_dir)
        if getattr(model, "image_encoder", None) is not None
        else None
    )
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), _build_handler(demo, defaults, i2v_demo=i2v_demo)
    )
    return server


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--mode", choices=["t2v", "i2v"], default="t2v",
                   help="which checkpoint family to serve (i2v adds the "
                   "image-upload form, reference scripts/gradio/i2v_test.py)")
    p.add_argument("--ckpt_path", type=str, default="")
    p.add_argument("--bpe_path", type=str, default="")
    p.add_argument("--result_dir", type=str, default="./tmp/demo")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--dev_tiny", action="store_true")
    return p.parse_args(argv)


def main(args):
    from dynamicscaler_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if args.dev_tiny:
        from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
        from dynamicscaler_tpu.utils.tokenizer import HashTokenizer

        model = LatentVideoDiffusion.init_random(
            tiny_test_config(img_attention=args.mode == "i2v"),
            jax.random.PRNGKey(0), tokenizer=HashTokenizer(512),
        )
        defaults = {"steps": 4, "height": 32, "width": 32}
    else:
        from dynamicscaler_tpu.config import videocrafter2_t2v, videocrafter_i2v
        from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion
        from dynamicscaler_tpu.utils.tokenizer import load_tokenizer
        from dynamicscaler_tpu.utils.weights import load_videocrafter_checkpoint

        config = (
            videocrafter_i2v(dtype=args.dtype)
            if args.mode == "i2v"
            else videocrafter2_t2v(dtype=args.dtype)
        )
        params = load_videocrafter_checkpoint(args.ckpt_path, config)
        model = LatentVideoDiffusion(
            config=config, params=params, tokenizer=load_tokenizer(args.bpe_path or None)
        )
        defaults = {"steps": 48, "height": 320, "width": 512}

    server = make_server(model, port=args.port, result_dir=args.result_dir, defaults=defaults)
    print(f"[demo] serving on http://127.0.0.1:{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main(parse_args())
