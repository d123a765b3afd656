"""The REAL lid.176.ftz language model, run by the pure-numpy ftz reader.

The reference wheel bundles the actual fastText model file; only the
fasttext native package is missing from this image. ``fasttext_ftz``
parses the quantized binary and reproduces supervised hierarchical-softmax
prediction, so stage 1's language gate runs the reference's real model —
upgrading the round-2 "heuristic fallback, documented delta" to the real
thing (round-1 weak #6 / PARITY §2.1).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

import numpy as np
import pytest

WHEEL = Path(
    "/root/reference/metadata_filtering/code/"
    "acav_metadata_filter-0.1.0-py3-none-any.whl"
)

pytestmark = pytest.mark.skipif(not WHEEL.is_file(), reason="wheel not present")


@pytest.fixture(scope="module")
def ftz_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("ftz")
    with zipfile.ZipFile(WHEEL) as z:
        z.extract("filter/statics/lid.176.ftz", d)
    return d / "filter" / "statics" / "lid.176.ftz"


@pytest.fixture(scope="module")
def model(ftz_path):
    from acav100m_tpu.pipeline.fasttext_ftz import load_model

    return load_model(ftz_path)


SAMPLES = {
    "hello how are you today my friend": "en",
    "bonjour je suis très content de vous voir": "fr",
    "hola amigos como estan ustedes hoy": "es",
    "guten tag wie geht es ihnen heute": "de",
    "olá tudo bem com você hoje meu amigo": "pt",
    "привет как дела у тебя сегодня": "ru",
    "こんにちは今日はいい天気ですね": "ja",
    "안녕하세요 오늘 날씨가 좋네요": "ko",
    # non-major languages the 8-major gate must reject
    "ciao come stai oggi amico mio": "it",
    "hallo hoe gaat het vandaag met jou": "nl",
    "γεια σας τι κάνετε σήμερα": "el",
    "merhaba bugün nasılsınız arkadaşlar": "tr",
    "你好今天天气真好我们一起去公园吧": "zh",
}


def test_model_structure(model):
    assert len(model.labels) == 176  # lid.176
    assert model.args["dim"] == 16
    assert model.input_rows.shape == (50000, 16)
    assert model.output.shape == (176, 16)
    # every label reachable through the Huffman tree with a unique path
    assert len(model.paths) == 176
    assert all(len(p) > 0 for p in model.paths)


def test_language_identification(model):
    for text, want in SAMPLES.items():
        labels, probs = model.predict(text, k=1)
        got = labels[0][-2:]
        assert got == want, f"{text!r}: {got} != {want}"
        assert probs[0] > 0.5, f"{text!r}: low confidence {probs[0]}"


def test_topk_shapes_and_probabilities(model):
    labels, probs = model.predict("hello how are you", k=5)
    assert len(labels) == 5 and len(probs) == 5
    assert all(l.startswith("__label__") for l in labels)
    # hierarchical softmax: full distribution sums to 1
    all_labels, all_probs = model.predict("hello how are you", k=176)
    assert np.isclose(all_probs.sum(), 1.0, atol=1e-4)
    assert (np.diff(all_probs) <= 1e-9).all()  # sorted descending


def test_empty_and_oov_text(model):
    labels, probs = model.predict("", k=1)
    assert labels == () or len(labels) >= 0  # no crash; empty -> no labels
    labels, probs = model.predict("zzzzqqqq xxyyzz", k=1)
    assert len(labels) == 1  # OOV tokens still produce subword vectors


def test_real_detector_in_filter_chain(ftz_path):
    """MetadataFilter's language gate running the REAL model: 8 majors
    pass, it/nl/el/tr/zh rejected (filter.py:123-148 semantics)."""
    from acav100m_tpu.pipeline.metadata_filtering import (
        MAJOR_LANGUAGES,
        FastTextLanguageDetector,
        MetadataFilter,
    )

    det = FastTextLanguageDetector(ftz_path)
    from acav100m_tpu.pipeline.fasttext_ftz import FtzModel

    assert isinstance(det.model, FtzModel)  # pure reader (no fasttext pkg)
    for text, lang in SAMPLES.items():
        assert det.run(text) == lang
        assert det.filter_major(text) == (lang in MAJOR_LANGUAGES)

    filt = MetadataFilter(keywords={}, language_detector=det)
    assert filt("v", "hello how are you today my friend", "People", 100)
    assert not filt("v", "ciao come stai oggi amico mio", "People", 100)
