"""G2P engine tests with faked phonemizer/epitran backends.

The optional packages (phonemizer + system espeak-ng, epitran, stanza) are not
installed in CI; these tests monkeypatch fake modules into ``sys.modules`` so the
PER-moving string handling — espeak language-switch flag parsing, the replacement
table, tie stripping, palatalized-vowel rejoining, the epitran tone backoff
(reference datasets/phonemes.py:346-470) — is exercised without them.
"""

import sys
import types

import pytest

from allophant_tpu.data.g2p import (
    EpitranG2P,
    EspeakNg,
    GraphemeToPhonemeEnsemble,
    PhonemeTranscription,
    TaggedTranscription,
    _split_language_flags,
)


# ---------------------------------------------------------------------------
# Fake phonemizer backend
# ---------------------------------------------------------------------------


class _FakeEspeakBackend:
    """Records constructor args and returns canned phonemizations."""

    created = []
    canned = {}

    def __init__(self, language, language_switch=None, with_stress=False, logger=None):
        self.language = language
        self.language_switch = language_switch
        self.with_stress = with_stress
        type(self).created.append(self)

    @staticmethod
    def supported_languages():
        return {"en-us": "English", "fr-fr": "French", "de": "German", "ru": "Russian"}

    def phonemize(self, sentences, separator):
        return [type(self).canned.get(sentence, sentence) for sentence in sentences]


@pytest.fixture
def fake_phonemizer(monkeypatch):
    package = types.ModuleType("phonemizer")
    backend = types.ModuleType("phonemizer.backend")
    separator = types.ModuleType("phonemizer.separator")

    _FakeEspeakBackend.created = []
    _FakeEspeakBackend.canned = {}
    backend.EspeakBackend = _FakeEspeakBackend

    class Separator:
        def __init__(self, word="", phone=" "):
            self.word = word
            self.phone = phone

    separator.Separator = Separator
    package.backend = backend
    package.separator = separator
    monkeypatch.setitem(sys.modules, "phonemizer", package)
    monkeypatch.setitem(sys.modules, "phonemizer.backend", backend)
    monkeypatch.setitem(sys.modules, "phonemizer.separator", separator)
    # The supported-language map is a class-level cache; reset it so the fake
    # backend's language list is used.
    monkeypatch.setattr(EspeakNg, "_SUPPORTED_STORAGE", None)
    return _FakeEspeakBackend


INVENTORY = ["a", "b", "ɔ", "u", "h", "l", "o", "ʃ", "s", "t", "ʲa", "ʊɐ", "ts", "w", "d", "ʒ", "ə", "ɛ"]


class TestEspeakNg(object):
    def test_flag_splitting_helper(self):
        spans = list(_split_language_flags("a b (fr)c d (de) e", "de"))
        assert spans == [(None, "a b"), ("fr", "c d"), (None, "e")]
        # Flag at the very start produces no empty leading span.
        assert list(_split_language_flags("(de)x y", "fr")) == [("de", "x y")]
        # No flags: one untagged span.
        assert list(_split_language_flags("x y", "de")) == [(None, "x y")]
        # Unterminated parenthesis is not a flag (the flag pattern matches the
        # reference's, run through re.split there, datasets/phonemes.py:453).
        assert list(_split_language_flags("x (fr y", "de")) == [(None, "x (fr y")]

    def test_language_switch_tagging(self, fake_phonemizer):
        fake_phonemizer.canned["hallo bonjour welt"] = "h a l o (fr)b ɔ u (de) w a l d"
        model = EspeakNg("de", INVENTORY)
        [tagged] = model._process_batch(["hallo bonjour welt"])
        assert [segment.language for segment in tagged] == [None, "fr", None]
        assert tagged[0].transcription == ["h", "a", "l", "o"]
        assert tagged[1].transcription == ["b", "ɔ", "u"]
        assert tagged[2].transcription == ["w", "a", "l", "d"]

    def test_main_language_flag_resets_to_none(self, fake_phonemizer):
        # Returning to the main language via its own flag clears the tag.
        fake_phonemizer.canned["x"] = "(fr)a b (de)o u"
        model = EspeakNg("de", INVENTORY)
        [tagged] = model._process_batch(["x"])
        assert [segment.language for segment in tagged] == ["fr", None]

    def test_replacement_table_applied(self, fake_phonemizer):
        # espeak noise: 'S' -> 'ʃ', 'A' -> 'a', '??' -> 'ʊɐ' (package_data table).
        fake_phonemizer.canned["sentence"] = "S A ??"
        model = EspeakNg("en", INVENTORY)
        [tagged] = model._process_batch(["sentence"])
        assert tagged[0].transcription == ["ʃ", "a", "ʊɐ"]

    def test_tie_stripped_and_palatalized_rejoined(self, fake_phonemizer):
        # Ties are removed ('t͡s' -> 'ts'); a lone 'ʲ' merges with the next
        # segment ('ʲ' + 'a' -> 'ʲa').
        fake_phonemizer.canned["sentence"] = "t͡s ʲ a"
        model = EspeakNg("en", INVENTORY)
        [tagged] = model._process_batch(["sentence"])
        assert tagged[0].transcription == ["ts", "ʲa"]

    def test_language_resolution_defaults(self, fake_phonemizer):
        # Bare "en" resolves through the default mapping to "en-us".
        model = EspeakNg("en", INVENTORY)
        assert model._espeak_main_language == "en-us"
        assert fake_phonemizer.created[-1].language == "en-us"
        assert fake_phonemizer.created[-1].language_switch == "keep-flags"

    def test_supports(self, fake_phonemizer):
        assert EspeakNg.supports("de")
        assert EspeakNg.supports("fr")
        assert not EspeakNg.supports("zu")


# ---------------------------------------------------------------------------
# Fake epitran backend
# ---------------------------------------------------------------------------


class _FakeEpitran:
    created = []

    def __init__(self, code, cedict_file=None, tones=False):
        self.code = code
        self.tones = tones
        type(self).created.append(self)

    def trans_list(self, word):
        # One pseudo-phoneme per character.
        return list(word)


class _FakeBackoff:
    created = []

    def __init__(self, lang_script_codes, cedict_file=None):
        self.codes = lang_script_codes
        self.langs = ["placeholder"]
        type(self).created.append(self)

    def trans_list(self, word):
        return list(word)


@pytest.fixture
def fake_epitran(monkeypatch):
    package = types.ModuleType("epitran")
    backoff_module = types.ModuleType("epitran.backoff")

    _FakeEpitran.created = []
    _FakeBackoff.created = []
    package.Epitran = _FakeEpitran
    backoff_module.Backoff = _FakeBackoff
    package.backoff = backoff_module

    # Keyed by normalized ISO 639-3 codes ("zh" standardizes to "zho").
    meta = types.SimpleNamespace(
        get_default_mode=lambda code: {"zho": "cmn-Hans", "spa": "spa-Latn", "vie": "vie-Latn"}.get(code),
        supported_lang=lambda code: code in ("zho", "spa", "vie"),
    )
    package.meta = meta
    monkeypatch.setitem(sys.modules, "epitran", package)
    monkeypatch.setitem(sys.modules, "epitran.backoff", backoff_module)
    return package


class TestEpitranG2P:
    def test_latin_script_uses_plain_epitran(self, fake_epitran):
        model = EpitranG2P("es", ["h", "o", "l", "a"], tones=True)
        assert isinstance(model._epitran, _FakeEpitran)
        assert model._epitran.code == "spa-Latn"
        assert model._epitran.tones is True

    def test_non_latin_with_tones_uses_backoff(self, fake_epitran):
        """Non-Latin script + tones: Backoff over [native, eng-Latn] whose
        transliterators are rebuilt with tones forwarded (stock epitran.Backoff
        drops the flag, reference datasets/phonemes.py:362-366)."""
        model = EpitranG2P("zh", ["a"], tones=True)
        assert isinstance(model._epitran, _FakeBackoff)
        assert model._epitran.codes == ["cmn-Hans", "eng-Latn"]
        # The backoff's transliterators were replaced with tone-enabled ones.
        assert all(isinstance(lang, _FakeEpitran) for lang in model._epitran.langs)
        assert [lang.code for lang in model._epitran.langs] == ["cmn-Hans", "eng-Latn"]
        assert all(lang.tones for lang in model._epitran.langs)

    def test_non_latin_without_tones_plain(self, fake_epitran):
        model = EpitranG2P("zh", ["a"], tones=False)
        assert isinstance(model._epitran, _FakeEpitran)
        assert model._epitran.tones is False

    def test_english_special_case(self, fake_epitran):
        # get_default_mode has no English entry; the engine hardcodes eng-Latn.
        model = EpitranG2P("en", ["a"])
        assert model._epitran.code == "eng-Latn"
        assert EpitranG2P.supports("en")

    def test_unsupported_language_raises(self, fake_epitran):
        with pytest.raises(ValueError, match="not supported"):
            EpitranG2P("zu", ["a"])
        assert not EpitranG2P.supports("zu")

    def test_process_batch_segments_words(self, fake_epitran):
        model = EpitranG2P("es", ["o", "l", "a", "s"], tones=False)
        [tagged] = model._process_batch([["olas", "sol"]])
        assert isinstance(tagged[0], TaggedTranscription)
        assert tagged[0].language is None
        # Characters of both words flow through the shared segmenter.
        assert tagged[0].transcription == ["o", "l", "a", "s", "s", "o", "l"]


class TestEnsemble:
    def test_two_engines_produce_parallel_transcriptions(self, fake_phonemizer, fake_epitran):
        fake_phonemizer.canned["ab"] = "a b"
        ensemble = GraphemeToPhonemeEnsemble([EspeakNg], ["a", "b"])
        assert ensemble.num_engines == 1
        extractor = ensemble.extractor("en")
        [batch] = list(extractor.auto_batch_g2p(["ab"], batch_size=4))
        [transcription] = list(batch)
        assert isinstance(transcription, PhonemeTranscription)
        assert [t.transcription for t in transcription.phonemes[0]] == [["a", "b"]]
        assert transcription.only_primary_script()

    def test_supports_requires_all_engines(self, fake_phonemizer, fake_epitran):
        ensemble = GraphemeToPhonemeEnsemble([EspeakNg], ["a"])
        assert ensemble.supports("de")
        assert not ensemble.supports("zu")
