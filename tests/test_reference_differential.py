"""Differential fidelity gate: run the REFERENCE's own metadata
comparators next to this repo's kernels over thousands of adversarial
generated pairs and assert identical verdicts.

This is the strongest form of the faithfulness claim the metacompare
docstrings make — not hand-picked examples but a seeded random sweep
over the tricky alphabet (number words, romans, ordinals, thousands
separators, superscripts, hyphen/dot compounds, Korean words, NFKC-
sensitive symbols, literal 'nan', newline/ideographic-space edges).

Skipped automatically when /root/reference is not present (the repo is
standalone; this gate only runs where the reference is mounted).
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys
import types

import pytest

from pdf_extract_spark.operators import metacompare as MC

REF_DIR = "/root/reference/euaa_사례/sentences"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def ref():
    """Load the reference's metadata_generator with its absent
    third-party imports stubbed (tqdm is not installed here; the module
    only uses it for progress bars we never call)."""
    tq = types.ModuleType("tqdm")
    tq.tqdm = lambda x, **k: x
    sys.modules.setdefault("tqdm", tq)
    sys.path.insert(0, REF_DIR)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_metadata_generator", os.path.join(REF_DIR, "metadata_generator.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(REF_DIR)


# the adversarial alphabet: every token class that has bitten a kernel
_TOKENS = [
    # digits in every cascade shape
    "1,234.5", "12,345", "3.5", "2-4", "1st", "2nd", "2ND", "x2nd", "7",
    "0", "100", "1000",
    # en number words incl. prefix-quirk words and months
    "one", "pair", "double", "dozen", "mayor", "Sept.", "quarterly",
    "twenty-one", "thousands",
    # kr words incl. the mapped ones and compounds
    "이중", "더블", "이중화", "격벽", "탱크", "제3장", "2번째",
    # latin words: plurals, hyphens, dots, romans, acronyms
    "tank", "tanks", "bodies", "ballast-water", "state-of-the-art",
    "Ph.D", "iii", "x", "IMO", "SOLAS",
    # punct + symbols + NFKC-sensitive chars
    "done.", "what?", "a:b;c", "50%", "…", "×", "†", "℃", "™", "②",
    "m²", "H₂O", "(주)", "“quote”", "', '",
    # noise / edge whitespace
    "nan", " nan. ", "", " ", "\t", "\n", "　", " ",
]


def _gen(rng: random.Random) -> str:
    n = rng.randint(0, 6)
    return " ".join(rng.choice(_TOKENS) for _ in range(n))


N_PAIRS = 1500


def test_differential_number_status(ref):
    cmp = ref.IntegratedNumberComparer()
    rng = random.Random(20260817)
    for _ in range(N_PAIRS):
        kr, en = _gen(rng), _gen(rng)
        want = cmp.compare(kr, en)
        got_status, got_kr, got_en = MC.compare_numbers(kr, en)
        assert got_status == want["number_match_status"], (kr, en)
        assert got_kr == want["kor_numbers"], (kr, en)
        assert got_en == want["eng_numbers_after_mapping"], (kr, en)


def test_differential_word_status(ref):
    rng = random.Random(7)
    for _ in range(N_PAIRS):
        kr, en = _gen(rng), _gen(rng)
        assert MC.word_status(kr, en) == ref.compare_english_words(kr, en)["status"], (kr, en)


def test_differential_symbol_status(ref):
    rng = random.Random(99)
    for _ in range(N_PAIRS):
        kr, en = _gen(rng), _gen(rng)
        assert (
            MC.symbol_status(kr, en)
            == ref.compare_special_symbols(kr, en)["symbol_match_status"]
        ), (kr, en)


def test_differential_punct(ref):
    rng = random.Random(314)
    for _ in range(N_PAIRS):
        kr, en = _gen(rng), _gen(rng)
        assert MC.extract_punct(kr) == ref.extract_punctuation(kr), kr
        assert (
            MC.punct_status(kr, en) == ref.compare_punctuation(kr, en)["match_type"]
        ), (kr, en)


def test_differential_pair_class(ref):
    rng = random.Random(2718)
    for _ in range(N_PAIRS):
        kr, en = _gen(rng), _gen(rng)
        assert MC.pair_class(kr, en) == ref.check_only_eng_korean_sentence(kr, en), (kr, en)


def test_differential_content_filters(ref):
    rng = random.Random(161803)
    for _ in range(N_PAIRS):
        t = _gen(rng)
        assert MC.is_numbers_only(t) == ref.is_numbers_only(t), t
        assert (
            MC.is_symbols_or_single_alphabet_only(t)
            == ref.is_symbols_or_single_alphabet_only(t)
        ), t
