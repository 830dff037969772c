"""CLIP BPE tokenizer mechanics (synthetic merges file) + hash stand-in."""

import gzip
import os

import numpy as np
import pytest

from dynamicscaler_tpu.utils.tokenizer import (
    CLIPBPETokenizer,
    HashTokenizer,
    bytes_to_unicode,
    load_tokenizer,
)


@pytest.fixture(scope="module")
def synth_tokenizer(tmp_path_factory):
    """Minimal merges file exercising the BPE merge loop: builds 'cat</w>'
    and 'he' 'hell' 'hello</w>' style merges."""
    merges = [
        "#version: synthetic",
        "c a",
        "ca t</w>",
        "h e",
        "l l",
        "he ll",
        "hell o</w>",
    ]
    # pad to the expected merge-count window (the loader slices 1:48893)
    path = tmp_path_factory.mktemp("bpe") / "merges.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    return CLIPBPETokenizer(str(path))


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_bpe_merges_apply(synth_tokenizer):
    tok = synth_tokenizer
    ids = tok.encode_text("cat")
    # 'cat' -> merged to a single token 'cat</w>'
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "cat</w>"
    ids = tok.encode_text("hello")
    assert [tok.decoder[i] for i in ids] == ["hello</w>"]
    # unknown word falls back to char-level tokens
    ids = tok.encode_text("dog")
    assert [tok.decoder[i] for i in ids] == ["d", "o", "g</w>"]


def test_padding_sot_eot(synth_tokenizer):
    tok = synth_tokenizer
    arr = tok(["cat hello", ""])
    assert arr.shape == (2, 77)
    assert arr[0, 0] == tok.sot
    assert arr[0, 3] == tok.eot
    assert (arr[0, 4:] == 0).all()
    assert arr[1, 0] == tok.sot and arr[1, 1] == tok.eot


def test_lowercase_and_whitespace(synth_tokenizer):
    tok = synth_tokenizer
    np.testing.assert_array_equal(tok("CAT"), tok("  cat  "))


def test_truncation_keeps_eot(synth_tokenizer):
    tok = synth_tokenizer
    arr = tok(" ".join(["dog"] * 100))
    assert arr.shape == (1, 77)
    assert arr[0, -1] == tok.eot


def test_load_tokenizer_missing_asset_hard_fails(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError, match="bpe_simple_vocab"):
        load_tokenizer(str(tmp_path / "missing.gz"))
    with pytest.raises(FileNotFoundError):
        load_tokenizer(None)


def test_load_tokenizer_explicit_fallback(tmp_path):
    t = load_tokenizer(str(tmp_path / "missing.gz"), allow_fallback=True)
    assert isinstance(t, HashTokenizer)
    arr = t(["hello world"])
    assert arr.shape == (1, 77)
    np.testing.assert_array_equal(t(["hello world"]), arr)  # deterministic
