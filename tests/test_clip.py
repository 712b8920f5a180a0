"""CLIP model: shapes, determinism, tokenizer behavior (tiny config)."""

import numpy as np
import pytest

from beyondff_tpu.models import clip as clip_mod
from beyondff_tpu.models.tokenizers import BertTokenizer, HashTokenizer


@pytest.fixture(scope="module")
def tiny_clip():
    return clip_mod.CLIP.create("test", seed=0)


def test_encode_shapes(tiny_clip):
    c = tiny_clip.cfg
    imgs = np.random.default_rng(0).normal(size=(3, c.image_resolution, c.image_resolution, 3)).astype(np.float32)
    feats = np.asarray(tiny_clip.encode_image(imgs))
    assert feats.shape == (3, c.embed_dim)
    tok = HashTokenizer(c.vocab_size, c.context_length)
    toks = tok(["a chair", "a photo of clothes"])
    tfeats = np.asarray(tiny_clip.encode_text(toks))
    assert tfeats.shape == (2, c.embed_dim)
    assert np.isfinite(tfeats).all() and np.isfinite(feats).all()


def test_text_encoding_deterministic_and_eot_pooling(tiny_clip):
    tok = HashTokenizer(tiny_clip.cfg.vocab_size, tiny_clip.cfg.context_length)
    a = np.asarray(tiny_clip.encode_text(tok(["chair"])))
    b = np.asarray(tiny_clip.encode_text(tok(["chair"])))
    np.testing.assert_array_equal(a, b)
    # different text -> different features
    c = np.asarray(tiny_clip.encode_text(tok(["table"])))
    assert not np.allclose(a, c)


def test_preprocess_shapes(tiny_clip):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40, 60, 3), dtype=np.uint8) for _ in range(2)]
    out = tiny_clip.preprocess(list(imgs))
    n = tiny_clip.cfg.image_resolution
    assert out.shape == (2, n, n, 3)
    assert out.dtype == np.uint8  # normalization happens on device
    feats = np.asarray(tiny_clip.encode_image(out))
    assert feats.shape == (2, tiny_clip.cfg.embed_dim)


def test_hash_tokenizer_layout():
    tok = HashTokenizer(512, 16)
    out = tok(["hello world"])
    assert out.shape == (1, 16)
    assert out[0, 0] == 510  # SOT
    assert out[0, 3] == 511  # EOT after 2 words
    assert out[0, 4:].sum() == 0


def test_bert_wordpiece(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "cloth", "##es", "chair", "a", "."]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    tok = BertTokenizer(str(p))
    out = tok(["clothes chair", "a zzz ."])
    ids = out["input_ids"]
    assert ids[0].tolist()[:5] == [2, 4, 5, 6, 3]  # CLS cloth ##es chair SEP
    assert ids[1].tolist()[:5] == [2, 7, 1, 8, 3]  # CLS a UNK . SEP
    assert out["attention_mask"][0, :5].all()


def test_clip_bpe_tokenizer_with_synthetic_vocab(tmp_path):
    """Exercise the real BPE algorithm with a miniature merges file."""
    import gzip

    from beyondff_tpu.models.tokenizers import ClipTokenizer

    merges = ["#version: 0.2"]
    # merge rules: "l o", "lo w</w>", "h e", "he y</w>"
    merges += ["l o", "lo w</w>", "h e", "he y</w>"]
    # pad to the expected merge count window (tokenizer slices [1:48894+1])
    path = tmp_path / "bpe.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")

    tok = ClipTokenizer(str(path), context_length=16)
    ids = tok.encode("low hey")
    # 'low' -> merges to single 'low</w>' token; 'hey' -> 'hey</w>'
    assert tok.encoder["low</w>"] in ids
    assert tok.encoder["hey</w>"] in ids
    # unknown word falls back to byte-level pieces, still encodable
    ids2 = tok.encode("zq")
    assert len(ids2) >= 1
    out = tok(["low hey"])
    assert out.shape == (1, 16)
    assert out[0, 0] == tok.sot
    # EOT directly after the two word tokens
    eot_pos = list(out[0]).index(tok.eot)
    assert eot_pos == 3


def test_encode_image_packed_yuv_matches_roundtripped_dense(tiny_clip):
    """The YCrCb 4:2:0 crop transport (fast-variant CLIP filter) must encode
    exactly the crops the device unpack produces — i.e. the only deviation
    vs dense upload is the measured transport error (tests/test_color.py),
    never an extra one from the fused unpack+encode program."""
    from beyondff_tpu.core import color

    n = tiny_clip.cfg.image_resolution
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (n // 2, n // 2, 3), np.uint8)
    import cv2

    crops = np.stack([
        cv2.resize(base, (n, n), interpolation=cv2.INTER_CUBIC),
        rng.integers(0, 256, (n, n, 3), np.uint8),
    ])
    packed = np.stack([color.pack_ycrcb420(c) for c in crops])
    got = np.asarray(tiny_clip.encode_image_packed_yuv(packed))
    # reference: unpack on device with the SAME op, then the dense encode
    unpacked = np.stack([np.asarray(color.upload_frame(c, yuv=True)) for c in crops])
    want = np.asarray(tiny_clip.encode_image(unpacked))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
