"""Differential tests: the reference's own dataset label path against ours.

Runs the reference's real ``dataset_processing.py`` (``TranscribedDataset`` /
``PhoneticallySegmentedDataset`` over the real reference
``PhoneticAttributeIndexer``) as the oracle for CTC *target construction* — the
host code that decides what every head trains toward: per-attribute label-id
sequences, the blank ``index_start_offset``, per-language inventory filtering,
the restricted-vs-unrestricted indexer choice, and the RAW label path used by
predict/evaluate (reference dataset_processing.py:176-347). Both sides are
driven with the same duck-typed corpus and precomputed features, so the
comparison isolates label semantics from audio IO.
"""

from __future__ import annotations

from io import StringIO
from typing import Dict, List, Sequence, Set

import numpy as np
import pytest

from reference_shim import (
    load_reference_dataset_processing,
    load_reference_phonetics,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted at /root/reference"
)

torch = pytest.importorskip("torch")

import allophant_tpu.phonetics.features as ours_features
from allophant_tpu.data.dataset import (
    BatchType,
    PhoneticallySegmentedDataset,
    SamplesProcessor,
    TranscribedDataset,
)
from test_reference_differential import build_pair, frame_csv, random_phoible_frame


@pytest.fixture(scope="module")
def ref_processing():
    return load_reference_dataset_processing()


@pytest.fixture(scope="module")
def ref():
    return load_reference_phonetics()[0]


@pytest.fixture(autouse=True)
def _quiet_warnings():
    import warnings

    import pandas as pd

    with pd.option_context("future.infer_string", False):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            yield


# ---------------------------------------------------------------------------
# Duck-typed corpus shared by both implementations
# ---------------------------------------------------------------------------


class _Transcription:
    """Stands in for the corpus transcription container: one phoneme list per
    G2P engine (reference datasets/phonemes.py:30-93)."""

    def __init__(self, engines: List[List[str]]):
        self._engines = engines

    def flattened_transcriptions(self) -> List[List[str]]:
        return [list(engine) for engine in self._engines]


class _Entry:
    def __init__(self, phonemes, utterance_id: str):
        self.phonemes = phonemes
        self.utterance_id = utterance_id


class _Item:
    def __init__(self, language_id: int, entry: _Entry):
        self.language_id = language_id
        self.entry = entry


class _Corpus:
    def __init__(self, items: List[_Item]):
        self._items = items

    def __getitem__(self, index: int) -> _Item:
        return self._items[index]

    def __len__(self) -> int:
        return len(self._items)

    def audio_for(self, _item):  # pragma: no cover - features are precomputed
        raise AssertionError("differential datasets must use precomputed features")


def _build_indexer_pair(ref, seed: int):
    rng = np.random.default_rng(seed)
    csv = frame_csv(random_phoible_frame(rng))
    return rng, build_pair(ref, csv)


def _random_transcribed_corpus(
    rng: np.random.Generator, phonemes: Sequence[str], language_count: int = 3, items: int = 12
):
    corpus_items = []
    for index in range(items):
        language_id = int(rng.integers(0, language_count))
        length = int(rng.integers(0, 9))
        sentence = rng.choice(phonemes, size=length).tolist()
        corpus_items.append(
            _Item(language_id, _Entry(_Transcription([sentence]), f"utt-{index}"))
        )
    return _Corpus(corpus_items)


def _precomputed_features(count: int) -> List[np.ndarray]:
    return [np.zeros((4 + i % 3, 1), dtype=np.float32) for i in range(count)]


def _random_inventories(
    rng: np.random.Generator, phonemes: Sequence[str], language_count: int
) -> Dict[int, Set[str]]:
    return {
        language_id: set(
            rng.choice(phonemes, size=int(rng.integers(1, len(phonemes))), replace=False).tolist()
        )
        for language_id in range(language_count)
    }


def _assert_indexed_samples_match(ref_dataset, our_dataset):
    assert len(our_dataset) == len(ref_dataset)
    for index in range(len(ref_dataset)):
        reference_batch = ref_dataset[index]
        ours = our_dataset[index]
        assert len(reference_batch.attribute_indices) == 1
        reference_labels = reference_batch.attribute_indices[0]
        assert list(ours.attribute_indices.keys()) == list(reference_labels.keys())
        for name, reference_values in reference_labels.items():
            np.testing.assert_array_equal(
                np.asarray(ours.attribute_indices[name]),
                reference_values.numpy(),
                err_msg=f"item {index}, attribute {name}",
            )
        np.testing.assert_array_equal(
            [len(values) for values in ours.attribute_indices.values()],
            reference_batch.label_lengths[0].numpy(),
        )
        assert int(reference_batch.language_ids) == ours.language_id
        assert int(reference_batch.lengths) == ours.length


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("offset", [0, 1])
def test_transcribed_indexed_labels_match_reference(ref, ref_processing, seed, offset):
    """INDEXED (training) labels: per-attribute ids with the CTC blank offset,
    through each side's real indexer (reference dataset_processing.py:219-236)."""
    rng, (ref_indexer, our_indexer) = _build_indexer_pair(ref, seed)
    phonemes = list(ref_indexer.phonemes)
    corpus = _random_transcribed_corpus(rng, phonemes)
    features = _precomputed_features(len(corpus))

    ref_dataset = ref_processing.TranscribedDataset(
        ref_processing.BatchType.INDEXED,
        corpus,
        ref_processing.SamplesProcessor(None, ref_indexer),
        index_start_offset=offset,
        features=features,
    )
    our_dataset = TranscribedDataset(
        BatchType.INDEXED,
        corpus,
        SamplesProcessor(None, our_indexer),
        index_start_offset=offset,
        features=features,
    )
    _assert_indexed_samples_match(ref_dataset, our_dataset)


@pytest.mark.parametrize("seed", range(3))
def test_unrestricted_inventory_indexer_choice_matches_reference(ref, ref_processing, seed):
    """``unrestricted_inventory=True`` swaps in ``full_subset_attributes``
    (reference dataset_processing.py:297-301): label ids must then come from the
    full-phoneme subset, not the training indexer."""
    rng, (ref_indexer, our_indexer) = _build_indexer_pair(ref, seed)
    phonemes = list(ref_indexer.full_subset_attributes.phonemes)
    corpus = _random_transcribed_corpus(rng, phonemes)
    features = _precomputed_features(len(corpus))

    ref_dataset = ref_processing.TranscribedDataset(
        ref_processing.BatchType.INDEXED,
        corpus,
        ref_processing.SamplesProcessor(None, ref_indexer),
        index_start_offset=1,
        features=features,
        unrestricted_inventory=True,
    )
    our_dataset = TranscribedDataset(
        BatchType.INDEXED,
        corpus,
        SamplesProcessor(None, our_indexer),
        index_start_offset=1,
        features=features,
        unrestricted_inventory=True,
    )
    assert our_dataset.unrestricted_inventory == ref_dataset.unrestricted_inventory == True  # noqa: E712
    _assert_indexed_samples_match(ref_dataset, our_dataset)


@pytest.mark.parametrize("seed", range(3))
def test_inventory_filtering_matches_reference(ref, ref_processing, seed):
    """Per-language inventory filtering drops out-of-inventory phonemes *before*
    indexing (reference dataset_processing.py:207-216) — order-preserving, not
    erroring."""
    rng, (ref_indexer, our_indexer) = _build_indexer_pair(ref, seed)
    phonemes = list(ref_indexer.phonemes)
    language_count = 3
    corpus = _random_transcribed_corpus(rng, phonemes, language_count=language_count)
    features = _precomputed_features(len(corpus))
    inventories = _random_inventories(rng, phonemes, language_count)

    ref_dataset = ref_processing.TranscribedDataset(
        ref_processing.BatchType.INDEXED,
        corpus,
        ref_processing.SamplesProcessor(None, ref_indexer),
        index_start_offset=1,
        features=features,
        inventories=inventories,
    )
    our_dataset = TranscribedDataset(
        BatchType.INDEXED,
        corpus,
        SamplesProcessor(None, our_indexer),
        index_start_offset=1,
        features=features,
        inventories=inventories,
    )
    _assert_indexed_samples_match(ref_dataset, our_dataset)


@pytest.mark.parametrize("seed", range(3))
def test_raw_labels_match_reference(ref, ref_processing, seed):
    """RAW (predict/evaluate) labels: filtered phoneme strings + utterance ids
    (reference dataset_processing.py:263-273)."""
    rng, (ref_indexer, our_indexer) = _build_indexer_pair(ref, seed)
    phonemes = list(ref_indexer.phonemes)
    language_count = 3
    corpus = _random_transcribed_corpus(rng, phonemes, language_count=language_count)
    features = _precomputed_features(len(corpus))
    inventories = _random_inventories(rng, phonemes, language_count)

    ref_dataset = ref_processing.TranscribedDataset(
        ref_processing.BatchType.RAW,
        corpus,
        ref_processing.SamplesProcessor(None, ref_indexer),
        features=features,
        inventories=inventories,
    )
    our_dataset = TranscribedDataset(
        BatchType.RAW,
        corpus,
        SamplesProcessor(None, our_indexer),
        features=features,
        inventories=inventories,
    )
    for index in range(len(corpus)):
        reference_batch = ref_dataset[index]
        ours = our_dataset[index]
        assert ours.raw_labels == reference_batch.raw_labels[0]
        assert [ours.utterance_id] == reference_batch.utterance_ids
        assert ours.language_id == int(reference_batch.language_ids)


@pytest.mark.parametrize("seed", range(3))
def test_segmented_dataset_matches_reference(ref, ref_processing, seed):
    """UCLA-style pre-segmented datasets always label against the unrestricted
    full-phoneme subset (reference dataset_processing.py:320-341) and wrap the
    single phone sequence as one engine."""
    rng, (ref_indexer, our_indexer) = _build_indexer_pair(ref, seed)
    phonemes = list(ref_indexer.full_subset_attributes.phonemes)
    items = []
    for index in range(10):
        length = int(rng.integers(0, 9))
        sentence = rng.choice(phonemes, size=length).tolist()
        items.append(_Item(int(rng.integers(0, 3)), _Entry(sentence, f"utt-{index}")))
    corpus = _Corpus(items)
    features = _precomputed_features(len(corpus))

    ref_dataset = ref_processing.PhoneticallySegmentedDataset(
        ref_processing.BatchType.INDEXED,
        corpus,
        ref_processing.SamplesProcessor(None, ref_indexer),
        index_start_offset=1,
        features=features,
    )
    our_dataset = PhoneticallySegmentedDataset(
        BatchType.INDEXED,
        corpus,
        SamplesProcessor(None, our_indexer),
        index_start_offset=1,
        features=features,
    )
    _assert_indexed_samples_match(ref_dataset, our_dataset)


def test_multi_engine_indexed_rejection(ref, ref_processing):
    """Documented hardening: the reference happily builds one label dict per G2P
    engine for INDEXED batches (dataset_processing.py:219-229) but its training
    loop then unpacks exactly one (estimator.py:636), crashing late — we reject
    multi-engine INDEXED corpora at label-generation time instead."""
    rng, (ref_indexer, our_indexer) = _build_indexer_pair(ref, 0)
    phonemes = list(ref_indexer.phonemes)
    sentence_a = rng.choice(phonemes, size=3).tolist()
    sentence_b = rng.choice(phonemes, size=2).tolist()
    corpus = _Corpus([_Item(0, _Entry(_Transcription([sentence_a, sentence_b]), "utt-0"))])
    features = _precomputed_features(1)

    ref_dataset = ref_processing.TranscribedDataset(
        ref_processing.BatchType.INDEXED,
        corpus,
        ref_processing.SamplesProcessor(None, ref_indexer),
        index_start_offset=1,
        features=features,
    )
    assert len(ref_dataset[0].attribute_indices) == 2

    our_dataset = TranscribedDataset(
        BatchType.INDEXED,
        corpus,
        SamplesProcessor(None, our_indexer),
        index_start_offset=1,
        features=features,
    )
    with pytest.raises(ValueError, match="exactly one transcription"):
        our_dataset[0]
