"""Golden phoneme-list tests ported from the reference.

The reference's ONLY golden-output tests are
/root/reference/valle/tests/data/tokenizer_test.py:23-77 — pinned espeak and
pypinyin phoneme lists for fixed input strings.  Those pin the input contract
of the whole system (the k2symbols token stream).

Neither ``phonemizer``/espeak-ng nor ``pypinyin`` is installed in this
environment, so the tests come in two tiers:

  1. Dep-free (always run): the *phonemized strings* those backends emit are
     reconstructed in their separator convention (phones joined by "|",
     words by "_", syllables by "-") and fed to ``TextTokenizer.to_list`` —
     asserting the reference's exact golden token lists.  This pins the
     regex post-processing (ref data/tokenizer.py:152-164) on the real
     phoneme inventory (multi-char IPA phones, punctuation, quotes).
  2. Skip-gated (run when the deps exist): the reference's test cases
     verbatim, end-to-end through the actual backends.
"""

import pytest

from valle_tpu.data.text_tokenizer import Separator, TextTokenizer


def _tok(backend: str = "chars") -> TextTokenizer:
    return TextTokenizer(backend=backend)


def _espeak_convention(token_list):
    """Rebuild the phonemized string the espeak backend would emit for a
    golden token list: '_' tokens are word separators; phones within a word
    are joined by the phone separator '|' (with phonemizer's trailing '|'
    per word, the same convention CharsBackend uses)."""
    words, cur = [], []
    for t in token_list:
        if t == "_":
            words.append(cur)
            cur = []
        else:
            cur.append(t)
    words.append(cur)
    return "_".join("|".join(w) + "|" for w in words)


# Reference goldens: ref valle/tests/data/tokenizer_test.py:26-36 (espeak).
ESPEAK_GOLDENS = [
    (
        "The two parties, the sheep and the wolves, met each other.",
        ["ð", "ə", "_", "t", "uː", "_", "p", "ɑːɹ", "ɾ"],
    ),
    (
        "Mother! dear father! do you hear me?",
        ["m", "ʌ", "ð", "ɚ", "!", "_", "d", "ɪɹ", "_", "f", "ɑː", "ð", "ɚ",
         "!"],
    ),
    (
        "\"Whoever thou art,\" She exclaimed, suddenly seizing Rodolfo's "
        "hand,",
        ['"', "h", "uː", "ɛ", "v", "ɚ", "_", "ð", "aʊ", "_", "ɑːɹ", "t", ",",
         '"', "_", "ʃ", "iː", "_", "ɛ", "k", "s", "k", "l", "eɪ", "m", "d",
         ",", "_", "s", "ʌ", "d", "ə", "n", "l", "i", "_", "s", "iː", "z",
         "ɪ", "ŋ", "_", "ɹ", "ə", "d", "ɑː", "l", "f", "oʊ", "z", "_", "h",
         "æ", "n", "d", ","],
    ),
]

# Reference goldens: ref tokenizer_test.py:41-51 (pypinyin backend) — the
# phonemized string is PypinyinBackend's own output format (syllables joined
# by '-', no phone separator).
PYPINYIN_GOLDENS = [
    (
        "你好这是测试",
        "ni3-hao3-zhe4-shi4-ce4-shi4",
        ["ni3", "-", "hao3", "-", "zhe4", "-", "shi4", "-", "ce4", "-",
         "shi4"],
    ),
    (
        '"你好", 这是测试.',
        '"ni3-hao3",_zhe4-shi4-ce4-shi4.',
        ['"', "ni3", "-", "hao3", '"', ",", "_", "zhe4", "-", "shi4", "-",
         "ce4", "-", "shi4", "."],
    ),
    (
        "此项 工作 还能 怎么 改进",
        "ci3-xiang4_gong1-zuo4_hai2-neng2_zen3-me5_gai3-jin4",
        ["ci3", "-", "xiang4", "_", "gong1", "-", "zuo4", "_", "hai2", "-",
         "neng2", "_", "zen3", "-", "me5", "_", "gai3", "-", "jin4"],
    ),
]

# Reference goldens: ref tokenizer_test.py:55-72 (pypinyin_initials_finals) —
# initial|final pairs joined by '|', syllables by '-'.
PYPININIT_GOLDENS = [
    (
        "你好这是测试",
        "n|i3-h|ao3-zh|e4-sh|i4-c|e4-sh|i4",
        ["n", "i3", "-", "h", "ao3", "-", "zh", "e4", "-", "sh", "i4", "-",
         "c", "e4", "-", "sh", "i4"],
    ),
    (
        '"你好.这是测试.',
        '"n|i3-h|ao3.zh|e4-sh|i4-c|e4-sh|i4.',
        ['"', "n", "i3", "-", "h", "ao3", ".", "zh", "e4", "-", "sh", "i4",
         "-", "c", "e4", "-", "sh", "i4", "."],
    ),
    (
        '"你好. 这是测试.',
        '"n|i3-h|ao3._zh|e4-sh|i4-c|e4-sh|i4.',
        ['"', "n", "i3", "-", "h", "ao3", ".", "_", "zh", "e4", "-", "sh",
         "i4", "-", "c", "e4", "-", "sh", "i4", "."],
    ),
    (
        "此项 工作 还能 怎么 改进",
        "c|i3-x|iang4_g|ong1-z|uo4_h|ai2-n|eng2_z|en3-m|e5_g|ai3-j|in4",
        ["c", "i3", "-", "x", "iang4", "_", "g", "ong1", "-", "z", "uo4",
         "_", "h", "ai2", "-", "n", "eng2", "_", "z", "en3", "-", "m", "e5",
         "_", "g", "ai3", "-", "j", "in4"],
    ),
]


class TestToListGoldens:
    """Dep-free: reference golden lists through ``to_list``."""

    def test_espeak_goldens(self):
        tok = _tok()
        for _input, target in ESPEAK_GOLDENS:
            phonemized = _espeak_convention(target)
            assert tok.to_list(phonemized) == target, _input

    def test_pypinyin_goldens(self):
        tok = _tok()
        for _input, phonemized, target in PYPINYIN_GOLDENS:
            assert tok.to_list(phonemized) == target, _input

    def test_pypinyin_initials_finals_goldens(self):
        tok = _tok()
        for _input, phonemized, target in PYPININIT_GOLDENS:
            assert tok.to_list(phonemized) == target, _input

    def test_call_plumbing_with_stub_backend(self):
        """__call__ -> backend.phonemize -> to_list on espeak-style output
        (the backend object is stubbed; the post-processing is real)."""

        class Stub:
            def phonemize(self, text, separator, strip=True, njobs=1):
                assert separator.word == "_" and separator.phone == "|"
                return [_espeak_convention(ESPEAK_GOLDENS[1][1])]

        tok = _tok()
        tok.backend = Stub()
        assert tok("Mother! dear father! do you hear me?")[0] == \
            ESPEAK_GOLDENS[1][1]

    def test_to_list_length_invariant(self):
        """to_list's internal assert (char-count conservation) holds on all
        golden strings — a transcription slip in the separator handling
        would trip it."""
        tok = _tok()
        for _, target in ESPEAK_GOLDENS:
            tok.to_list(_espeak_convention(target))
        for _, phonemized, _t in PYPINYIN_GOLDENS + PYPININIT_GOLDENS:
            tok.to_list(phonemized)


class TestBackendsEndToEnd:
    """The reference's test cases verbatim, gated on the actual deps."""

    def test_espeak(self):
        pytest.importorskip("phonemizer")
        tok = _tok("espeak")
        for _input, target in ESPEAK_GOLDENS:
            phonemized = tok(_input)
            assert phonemized[0][: len(target)] == target

    def test_pypinyin(self):
        pytest.importorskip("pypinyin")
        tok = _tok("pypinyin")
        for _input, _phonemized, target in PYPINYIN_GOLDENS:
            assert tok(_input)[0] == target

    def test_pypinyin_initials_finals(self):
        pytest.importorskip("pypinyin")
        tok = _tok("pypinyin_initials_finals")
        for _input, _phonemized, target in PYPININIT_GOLDENS:
            assert tok(_input)[0] == target


def test_separator_defaults():
    """The separator contract the whole pipeline assumes
    (ref data/tokenizer.py:121-125)."""
    s = Separator()
    assert (s.word, s.syllable, s.phone) == ("_", "-", "|")
