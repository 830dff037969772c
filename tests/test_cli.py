"""CLI smoke tests (dev_tiny: full orchestration, tiny random model)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_pano(tmp_path_factory):
    p = tmp_path_factory.mktemp("in") / "pano.png"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((64, 128, 3)) * 255).astype(np.uint8)).save(p)
    return str(p)


def test_gen_pano_360_three_stages(tiny_pano, tmp_path):
    from dynamicscaler_tpu.cli.gen_pano_360 import VArgs, main

    out = main(
        VArgs(
            dev_tiny=True,
            pano_image_path=tiny_pano,
            output_dir=str(tmp_path),
            project_name="t",
            save_latents=True,
        )
    )
    files = set(os.listdir(out))
    assert "sphere_SW_latent.npy" in files
    assert "basic_SW_latent.npy" in files
    assert "denoised_latent2x.npy" in files
    assert "args.json" in files
    lat = np.load(os.path.join(out, "denoised_latent2x.npy"))
    assert lat.shape == (1, 4, 32, 64, 4)  # 2x of tiny equirect 64x32 / vs 2
    assert np.isfinite(lat).all()
    args = json.load(open(os.path.join(out, "args.json")))
    assert args["dev_tiny"] is True


def test_gen_pano_360_repeat_warm_resident(tiny_pano, tmp_path):
    """--repeat_warm runs the pipeline twice in-process; the second pass
    writes a run_type=warm_resident artifact chained to the first's total."""
    from dynamicscaler_tpu.cli import gen_pano_360 as g

    out = g.main(
        g.VArgs(
            dev_tiny=True,
            pano_image_path=tiny_pano,
            output_dir=str(tmp_path),
            project_name="rw",
            repeat_warm=True,
        )
    )
    assert out.endswith("-warm2")
    args = json.load(open(os.path.join(out, "args.json")))
    assert args["resident_pass"] is True
    # dev_tiny geometry never qualifies for results/e2e_latest.json — check
    # the label logic directly (full default geometry), snapshotting and
    # restoring the real artifact file around the probe write
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results", "e2e_latest.json")
    before = open(art).read() if os.path.exists(art) else None
    try:
        g._write_e2e_artifact(
            g.VArgs(resident_pass=True),
            {"sphere": 1.0, "planar_1x": 1.0, "upscale": 1.0}, 3.0, {},
        )
        rec = json.load(open(art))
        assert rec["run_type"] == "warm_resident"
    finally:
        if before is None:
            os.remove(art)
        else:
            open(art, "w").write(before)


def test_gen_pano_360_resume_stage1(tiny_pano, tmp_path):
    from dynamicscaler_tpu.cli.gen_pano_360 import VArgs, main

    out1 = main(
        VArgs(
            dev_tiny=True, pano_image_path=tiny_pano, output_dir=str(tmp_path),
            project_name="a", do_upscale=False,
        )
    )
    sp = os.path.join(out1, "sphere_SW_latent.npy")
    out2 = main(
        VArgs(
            dev_tiny=True, pano_image_path=tiny_pano, output_dir=str(tmp_path),
            project_name="b", do_upscale=False, predenoised_SP_latent_path=sp,
        )
    )
    a = np.load(os.path.join(out1, "basic_SW_latent.npy"))
    b = np.load(os.path.join(out2, "basic_SW_latent.npy"))
    # same seed + same resumed stage-1 latent -> identical stage-2 output
    np.testing.assert_array_equal(a, b)


def test_batch_eval_rank_sharding(tmp_path):
    from dynamicscaler_tpu.cli import batch_eval

    pf = tmp_path / "prompts.txt"
    pf.write_text("one\ntwo\nthree\n")
    args = batch_eval.parse_args(
        [
            "--prompt_file", str(pf), "--dev_tiny", "--output_dir", str(tmp_path / "o"),
            "--rank", "1", "--world_size", "2",
        ]
    )
    batch_eval.main(args)
    outs = os.listdir(tmp_path / "o")
    # rank 1 of 2 gets prompt index 1 only ("two")
    assert any("two" in o for o in outs)
    assert not any("one" in o or "three" in o for o in outs)


def test_batch_eval_i2v_mode(tmp_path):
    """--mode i2v pairs sorted cond images with prompts 1:1
    (scripts/evaluation/inference.py:80-85,111-117)."""
    from PIL import Image
    import numpy as np
    from dynamicscaler_tpu.cli import batch_eval

    pf = tmp_path / "prompts.txt"
    pf.write_text("alpha\nbeta\n")
    cond = tmp_path / "cond"
    cond.mkdir()
    for n in ("a.png", "b.png"):
        Image.fromarray(np.full((16, 16, 3), 128, np.uint8)).save(cond / n)
    args = batch_eval.parse_args(
        [
            "--prompt_file", str(pf), "--dev_tiny", "--mode", "i2v",
            "--cond_input", str(cond), "--output_dir", str(tmp_path / "o"),
            "--rank", "0", "--world_size", "1",
        ]
    )
    batch_eval.main(args)
    outs = os.listdir(tmp_path / "o")
    assert any("alpha" in o for o in outs) and any("beta" in o for o in outs)


def test_demo_server_generates(tmp_path):
    """The stdlib HTTP demo (reference gradio surface, t2v_test.py:9-61):
    form page served, POST /generate runs a tiny generation and inlines
    the animation."""
    import http.client
    import threading
    import jax

    from dynamicscaler_tpu.cli.demo import make_server
    from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
    from dynamicscaler_tpu.utils.tokenizer import HashTokenizer

    model = LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=False), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )
    server = make_server(
        model, port=0, result_dir=str(tmp_path),
        defaults={"steps": 2, "height": 32, "width": 32},
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        assert "Generate" in page and "Prompt" in page

        body = "prompt=a+swan&steps=2&cfg=7.5&seed=1"
        conn.request("POST", "/generate", body=body,
                     headers={"Content-Type": "application/x-www-form-urlencoded"})
        resp = conn.getresponse().read().decode()
        assert "data:image/gif;base64," in resp or "data:video/mp4;base64," in resp
    finally:
        server.shutdown()


def test_demo_server_i2v_upload(tmp_path):
    """Image-conditioned model: the demo serves the i2v upload form
    (reference scripts/gradio/i2v_test.py) and generates from a posted
    image via multipart/form-data."""
    import http.client
    import io as _io
    import threading
    import jax
    from PIL import Image

    from dynamicscaler_tpu.cli.demo import make_server
    from dynamicscaler_tpu.models.lvdm import LatentVideoDiffusion, tiny_test_config
    from dynamicscaler_tpu.utils.tokenizer import HashTokenizer

    model = LatentVideoDiffusion.init_random(
        tiny_test_config(img_attention=True), jax.random.PRNGKey(0),
        tokenizer=HashTokenizer(512),
    )
    server = make_server(
        model, port=0, result_dir=str(tmp_path),
        defaults={"steps": 2, "height": 32, "width": 32},
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        assert "/generate_i2v" in page and 'type="file"' in page

        buf = _io.BytesIO()
        Image.fromarray(
            (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
        ).save(buf, format="PNG")
        boundary = "xDEMOBOUNDARYx"
        parts = []
        for name, val in [("prompt", b"a swan"), ("steps", b"2"),
                          ("cfg", b"7.5"), ("seed", b"1")]:
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"'
                f"\r\n\r\n".encode() + val + b"\r\n"
            )
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="image"; '
            f'filename="in.png"\r\nContent-Type: image/png\r\n\r\n'.encode()
            + buf.getvalue() + b"\r\n"
        )
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        conn.request(
            "POST", "/generate_i2v", body=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        resp = conn.getresponse().read().decode()
        assert "data:image/gif;base64," in resp or "data:video/mp4;base64," in resp
    finally:
        server.shutdown()


def test_load_first_frame_image_and_video_branch(tmp_path):
    """utils.io.load_first_frame: images load like load_image; video files
    route to the imageio backend (funcs.py:156-167 decord branch) and fail
    with a clear backend error in this ffmpeg-less environment."""
    import numpy as np
    import pytest as _pytest

    from dynamicscaler_tpu.utils.io import load_first_frame, load_image

    p = tmp_path / "c.png"
    rng = np.random.default_rng(1)
    Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(p)
    a = load_first_frame(str(p), 8, 8)
    np.testing.assert_array_equal(a, load_image(str(p), 8, 8))

    v = tmp_path / "c.mp4"
    v.write_bytes(b"\x00\x00\x00\x18ftypmp42")  # stub container header
    try:
        frame = load_first_frame(str(v), 8, 8)
    except RuntimeError as e:
        assert "imageio" in str(e) and "backend" in str(e)
    else:  # a real video backend exists in this env — must return a frame
        assert frame.shape == (8, 8, 3)
