"""IPA sentence segmentation and complex-segment utilities.

Behavioral counterpart of /root/reference/allophant/phoneme_segmentation.py. Unicode
mark classification, grapheme-cluster splitting and the dedup'ing missing-phoneme
warning logger all follow the reference semantics since they directly influence PER.
"""

from __future__ import annotations

import itertools
import logging
import unicodedata
from logging import FileHandler, Filter, LogRecord, Logger
from typing import Iterable, Iterator, List, Sequence

from regex import regex

from allophant_tpu.phonemes import IpaSegmenter

# IPA tone letters (U+A700 block) used by PHOIBLE tone contours.
TONES = [chr(code) for code in range(0xA700, 0xA720)]
_TONE_SET = frozenset(TONES)

VOWELS = frozenset(
    "aeiouy"
    "æøœɐɑɒɔɘəɚɛɜɝɞɤɨɪɯɵɶʉʊʌʏ"
)


def filter_tones(inventory: Iterable[str]) -> Iterator[str]:
    """Yields phonemes that contain no IPA tone letters.

    (The reference's implementation at phoneme_segmentation.py:54-57 swaps the
    ``re.search`` argument order; for the single-character tone symbols it filters in
    practice both behaviors agree, and this spelling implements the documented intent.)
    """
    for phoneme in inventory:
        if not any(character in _TONE_SET for character in phoneme):
            yield phoneme


class _MissingPhonemeFilter(Filter):
    _DEFAULT_LANGUAGE = "unknown"

    def __init__(self):
        super().__init__()
        self._seen = set()
        self.language = self._DEFAULT_LANGUAGE

    def filter(self, record: LogRecord) -> bool:
        phoneme = record.msg
        entry = (self.language, phoneme)
        if entry in self._seen:
            return False
        self._seen.add(entry)
        record.msg = f"Missing phoneme segment: ({self.language}) {phoneme!r}"
        return True

    def reset(self) -> None:
        self._seen = set()
        self.language = self._DEFAULT_LANGUAGE


class SegmentationLogger:
    """Warning logger that dedups missing-phoneme reports per language context."""

    def __init__(self) -> None:
        self._reset_steps = 0
        self._segmentation_logger = logging.getLogger("allophant_tpu.phonetics.segmentation")
        self._segmentation_logger.setLevel(logging.WARNING)
        self._filter = _MissingPhonemeFilter()
        self._segmentation_logger.addFilter(self._filter)

    def add_file_handler(self, log_path) -> None:
        self._segmentation_logger.addHandler(FileHandler(log_path, mode="w", encoding="utf-8"))

    def context_language(self, language: str) -> None:
        self._filter.language = language

    @property
    def log(self) -> Logger:
        return self._segmentation_logger

    def reset(self) -> None:
        if self._reset_steps > 0:
            self._reset_steps -= 1
        else:
            self._filter.reset()

    def suppress_resets(self, count: int = 1) -> None:
        self._reset_steps += count


SEGMENTATION_LOGGER = SegmentationLogger()


class SegmentationProcessor:
    """Hook points for pre/post-processing phonemes during lossy segmentation."""

    def pre_process(self, phoneme: str, _phoneme_iterator: Iterator[str]) -> str:
        return phoneme

    def post_process(self, sub_segments: List[str], _phoneme_iterator: Iterator[str]) -> Sequence[str]:
        return sub_segments


class IpaSentenceSegmenter:
    """Segments per-word phoneme sequences against a vocabulary.

    ``__call__`` is strict (raises on unknown spans); ``lossy_segment`` drops unknown
    spans while logging them once per (language, phoneme).
    """

    def __init__(self, dictionary: List[str], processor: SegmentationProcessor | None = None) -> None:
        self._segmenter = IpaSegmenter(dictionary)
        self._processor = SegmentationProcessor() if processor is None else processor

    @property
    def word_segmenter(self) -> IpaSegmenter:
        return self._segmenter

    def __call__(self, phonetic_sentences: Iterable[List[str]]) -> Iterator[List[str]]:
        return (self._segmenter.segment_words_checked(sentence) for sentence in phonetic_sentences)

    def lossy_segment(self, phonetic_sentences: Iterable[List[str]]) -> Iterator[List[str]]:
        for sentence in phonetic_sentences:
            sentence_phonemes: List[str] = []
            phoneme_iterator = iter(sentence)
            for phoneme in phoneme_iterator:
                pre_processed = self._processor.pre_process(phoneme, phoneme_iterator)
                sub_segments = self._processor.post_process(
                    self._segmenter.segment(pre_processed), phoneme_iterator
                )
                sentence_phonemes.extend(sub_segments)
                if len(sub_segments) != 1:
                    if "".join(sub_segments) != pre_processed:
                        SEGMENTATION_LOGGER.log.warning(pre_processed + " (Missing sub-segment when split)")
                    else:
                        SEGMENTATION_LOGGER.log.warning(pre_processed)
            yield sentence_phonemes


def _is_mark(character: str) -> bool:
    category = unicodedata.category(character)
    return category.endswith("m") or category == "Sk" or category.startswith("M")


def is_vowel_only_segment(segment: str) -> bool:
    return all(character in VOWELS for character in segment if not _is_mark(character))


def base_phonemes(segment: str) -> Iterator[str]:
    """Characters that are not marks or diacritics — the phoneme base characters."""
    return (character for character in segment if not _is_mark(character))


def complex_with_vowel(base_characters: Iterable[str]) -> bool:
    count = 0
    has_vowel = False
    for character in base_characters:
        if character in VOWELS:
            has_vowel = True
        count += 1
    return has_vowel and count > 1


def is_multi_vowel(base_characters: Iterable[str]) -> bool:
    count = 0
    for character in base_characters:
        if character not in VOWELS:
            return False
        count += 1
    return count > 1


def split_complex_segment(segment: str) -> List[str]:
    """Splits a complex segment into per-base grapheme clusters, attaching leading
    marks to the following cluster and trailing marks to the preceding one."""
    clusters: List[str] = []
    prefix = ""
    for grapheme_match in regex.finditer(r"\X", segment):
        grapheme = grapheme_match.group()
        if len(grapheme) == 1 and _is_mark(grapheme):
            if not clusters:
                prefix += grapheme
            else:
                clusters[-1] += grapheme
        else:
            clusters.append(prefix + grapheme)
            prefix = ""
    # Mark-only segments (e.g. tone contours) stay together.
    if prefix:
        clusters.append(prefix)
    return clusters


def split_all_complex_segments(segments: Iterable[str]) -> Iterator[str]:
    return itertools.chain.from_iterable(map(split_complex_segment, segments))


def split_phoneme_segment(segment: str) -> List[List[str]]:
    return [split_complex_segment(subsegment) for subsegment in segment.split("|")]


def iterator_length(iterator: Iterator) -> int:
    return sum(1 for _ in iterator)
