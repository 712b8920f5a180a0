"""Descriptor generation: determinism, structure, method selection."""

import pytest

from beyondff_tpu.pipeline import descriptors


def test_waffle_deterministic_by_seed():
    a = descriptors.generate("clothes", "waffle", seed=3)["clothes"]
    b = descriptors.generate("clothes", "waffle", seed=3)["clothes"]
    c = descriptors.generate("clothes", "waffle", seed=4)["clothes"]
    assert a == b
    assert a != c
    assert len(a) == 30  # 15 pairs of (word, char) descriptors
    assert all(p.startswith("A photo of a clothes, which") for p in a)


def test_toy_descriptors():
    out = descriptors.generate("tv stand", "toy")["tv stand"]
    assert len(out) == 11
    assert all("tv stand" in p for p in out)


def test_descriptor_sentence_glue():
    assert descriptors.make_descriptor_sentence("a red thing") == "which is a red thing"
    assert descriptors.make_descriptor_sentence("has legs") == "which has legs"
    assert descriptors.make_descriptor_sentence("used for sitting") == "which is used for sitting"
    assert descriptors.make_descriptor_sentence("metal frame") == "which has metal frame"


def test_gpt_requires_llm():
    with pytest.raises(ValueError):
        descriptors.generate("chair", "gpt")
    out = descriptors.generate(
        "chair", "gpt", llm=lambda prompt: "- four legs\n- a backrest\nnoise")
    assert out["chair"] == [
        "A photo of a chair, which has four legs.",
        "A photo of a chair, which is a backrest.",
    ]


def test_unknown_method():
    with pytest.raises(ValueError):
        descriptors.generate("chair", "nope")
