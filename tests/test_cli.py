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
