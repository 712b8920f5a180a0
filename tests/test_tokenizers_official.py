"""Tokenizer-algorithm validation against the official implementations.

The reference's text path runs the official tokenizers — pip ``clip``'s BPE
(segmentation_2d.py:324-337, refinement.py:93-115) and the HF BERT WordPiece
inside the groundingdino stack. Our pure-python rebuilds
(beyondff_tpu/models/tokenizers.py) are validated here against transformers'
``CLIPTokenizer``/``BertTokenizer`` instantiated from small LOCAL vocab
fixtures built in-test (no downloads) — same algorithms, adversarial inputs:
punctuation, unicode, accents, CJK, underscores, huge words, phrase
boundaries.
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from beyondff_tpu.models import tokenizers as tok_mod  # noqa: E402

BERT_STRINGS = [
    "sofa, chair.",
    "a photo of the clothes, which has sleeves.",
    "trash can . paper towel dispenser . ceiling",
    "naive Cafe coffee",
    "naïve café résumé",
    "under_score and-hyphen and/slash",
    "don't stop-me now!!",
    "3.14 100% (a) [b] {c}",
    "x" * 120 + " ok",
    "  weird   spacing\tand\nnewlines  ",
    "中文 mixed words 汉",
    "[CLS] not special here?",
    "",
    "unknownblah qwzzk",
]

CLIP_STRINGS = [
    "a photo of a chair, which has legs.",
    "hello-world it's 3.14!",
    "N/A (50%) [x]?",
    "don't you've we're i'll he'd",
    "  spaced    out  ",
    "under_score",
    "zzzqqq unknown",
]


def _bert_vocab(tmp_path):
    pieces = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = ("sofa chair a photo of the clothes which has sleeves trash can paper "
             "towel dispenser ceiling naive cafe coffee resume and under score "
             "hyphen slash don stop me now ok weird spacing newlines mixed words "
             "not special here t s").split()
    pieces += sorted(set(words))
    pieces += list(".,!?()[]{}%/-_'\"")
    pieces += list("0123456789")
    pieces += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    pieces += ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    pieces += ["##ing", "##ed", "##er", "##es", "##s", "14", "##14", "100", "50"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(dict.fromkeys(pieces)) + "\n", encoding="utf-8")
    return str(path)


def test_bert_wordpiece_matches_official(tmp_path):
    from transformers import BertTokenizer as HFBertTokenizer

    vocab = _bert_vocab(tmp_path)
    ours = tok_mod.BertTokenizer(vocab)
    # the official algorithm family the groundingdino stack uses:
    # do_lower_case=True -> accents stripped, punctuation split, CJK spaced
    hf = HFBertTokenizer(vocab, do_lower_case=True)

    for s in BERT_STRINGS:
        want = hf.encode(s)  # [CLS] ... [SEP]
        got = [ours.cls] + ours.encode(s) + [ours.sep]
        assert got == want, f"mismatch for {s!r}: {got} vs {want}"


def test_bert_batch_contract(tmp_path):
    vocab = _bert_vocab(tmp_path)
    ours = tok_mod.BertTokenizer(vocab)
    out = ours(["sofa, chair.", "coffee"])
    assert out["input_ids"].shape == out["attention_mask"].shape
    assert out["input_ids"][0, 0] == ours.cls
    assert bool(out["attention_mask"][1, -1]) is False  # padded row


def _clip_fixture(tmp_path):
    """Tiny merges + the matching vocab.json, built exactly the way OpenAI
    constructs its vocabulary (bytes, bytes</w>, merges, specials) — our
    tokenizer consumes the merges file, HF consumes both files."""
    merges = [
        "t h", "th e</w>", "a</w> ", "c h", "ch a", "i r</w>", "cha ir</w>",
        "p h", "ph o", "pho t", "phot o</w>", "o f</w>", "h a", "ha s</w>",
        "l e", "le g", "leg s</w>", "w h", "wh i", "whi ch</w>", "' s</w>",
        "h e", "he l", "hel l", "hell o</w>", "w o", "wo r", "wor l",
        "worl d</w>", "d o", "do n</w>", "' t</w>", "1 4</w>", "5 0</w>",
        "1 0", "10 0</w>", "y o", "yo u</w>", "' v", "'v e</w>", "w e</w>",
        "' r", "'r e</w>", "i</w> ", "' l", "'l l</w>", "' d</w>",
        "s p", "sp a", "spa c", "spac e", "space d</w>", "o u", "ou t</w>",
        "u n", "un d", "und e", "unde r</w>", "s c", "sc o", "sco r",
        "scor e</w>", "_ _", "- -",
    ]
    merges = [m for m in merges if " " in m.strip()]
    bpe = tmp_path / "merges.txt"
    bpe.write_text("#version: 0.2\n" + "\n".join(merges) + "\n", encoding="utf-8")

    byte_vocab = list(tok_mod._bytes_to_unicode().values())
    vocab = byte_vocab + [v + "</w>" for v in byte_vocab]
    vocab += ["".join(m.split()) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vj = tmp_path / "vocab.json"
    vj.write_text(json.dumps({v: i for i, v in enumerate(vocab)}), encoding="utf-8")
    return str(bpe), str(vj)


def test_clip_bpe_matches_official(tmp_path):
    from transformers import CLIPTokenizer as HFCLIPTokenizer

    bpe_path, vocab_path = _clip_fixture(tmp_path)
    ours = tok_mod.ClipTokenizer(bpe_path)
    hf = HFCLIPTokenizer(vocab_file=vocab_path, merges_file=bpe_path)

    for s in CLIP_STRINGS:
        want = hf.encode(s, add_special_tokens=False)
        got = ours.encode(s)
        assert got == want, f"mismatch for {s!r}: {got} vs {want}"


def test_clip_call_layout(tmp_path):
    bpe_path, _ = _clip_fixture(tmp_path)
    ours = tok_mod.ClipTokenizer(bpe_path, context_length=12)
    out = ours(["a photo of a chair"])
    assert out.shape == (1, 12)
    assert out[0, 0] == ours.sot
    ids = out[0][out[0] != 0]
    assert ids[-1] == ours.eot
    # truncation keeps EOT last
    long = ours(["hello world " * 30])
    assert long[0, -1] == ours.eot
