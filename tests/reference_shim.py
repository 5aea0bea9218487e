"""Imports the reference's host-side phonetics modules for differential testing.

The reference (/root/reference/allophant) is pure-Python on these paths except for
three import-time dependencies this image lacks: the Rust ``allophant.phonemes``
extension, ``langcodes``, and ``panphon``. All three are replaceable without
touching the code under test:

- ``allophant.phonemes`` — the repo's ``allophant_tpu.phonemes`` keeps the exact
  module surface of the reference's ``allophant/phonemes.pyi`` stub by design,
  so it slots straight in.
- ``allophant.language_codes`` — the repo's embedded-table reimplementation of
  the same API. Both the reference module under test and the repo code share
  this single implementation, so language-code semantics cancel out of every
  differential comparison.
- ``panphon`` — referenced only on the default-CSV path of
  ``read_panphon(file=None)`` (phonetic_features.py:983); every test passes an
  explicit CSV, so a bare module stub suffices.

``allophant.config`` is stubbed with the four symbols ``phonetic_features``
imports (Config, FeatureSet, PhonemeLayerType, ProjectionEntryConfig —
reference config.py:625-663), and ``allophant.package_data`` with the two path
constants. ``allophant.utils`` and ``allophant.phoneme_segmentation`` are the
reference's own files, imported through the fake package's ``__path__`` — those
are part of the code under test.
"""

from __future__ import annotations

import importlib
import logging
import re
import sys
import types
from enum import Enum
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")
_REFERENCE_PACKAGE = REFERENCE_ROOT / "allophant"

_cache: tuple | None = None


def reference_available() -> bool:
    return (_REFERENCE_PACKAGE / "phonetic_features.py").is_file()


def _build_config_stub() -> types.ModuleType:
    import dataclasses
    from typing import Any, List, Optional

    module = types.ModuleType("allophant.config")

    class FeatureSet(Enum):
        # Values per reference config.py:647-653.
        PHOIBLE = "phoible"
        PANPHON = "panphon"

    class PhonemeLayerType(Enum):
        # Values per reference config.py:656-663.
        SHARED = "shared"
        PRIVATE = "private"
        ALLOPHONES = "allophones"

    class ProjectionEntryConfig:
        # Class constants per reference config.py:625-642; the dataclass fields
        # are irrelevant to the phonetics paths under test.
        OUTPUT_DEPENDENCY = "OUTPUT"
        OUTPUT_PATTERN = re.compile(r"^OUTPUT(?:_(\d+))?$")
        PHONEME_LAYER = "phoneme"
        PHONE = "phone"

        def __init__(self, name: str, dependencies=None):
            self.name = name
            self.dependencies = [self.OUTPUT_DEPENDENCY] if dependencies is None else dependencies

    class Config:
        """Opaque placeholder; tests drive ``from_config`` with duck-typed objects."""

    # --- Stubs consumed by the reference *network* modules -------------------
    # These mirror the field/constant surface the reference model code touches
    # (reference config.py); the marshmallow machinery is irrelevant to the
    # differential tests, which construct instances directly.

    @dataclasses.dataclass
    class MultiheadAttentionConfig:
        num_heads: int = 4
        positional_embeddings: bool = False

    @dataclasses.dataclass
    class EmbeddingCompositionConfig:
        embedding_size: int = 32

    @dataclasses.dataclass
    class ProjectionConfig:
        classes: List[Any] = dataclasses.field(default_factory=list)
        feature_set: Any = FeatureSet.PHOIBLE
        phoneme_layer: Any = PhonemeLayerType.SHARED
        embedding_composition: Optional[EmbeddingCompositionConfig] = None
        acoustic_model_dropout: float = 0.0
        dependency_blanks: bool = True
        allophone_l2_alpha: float = 10.0

    @dataclasses.dataclass
    class Wav2Vec2PretrainedConfig:
        model_id: str = "facebook/wav2vec2-xls-r-300m"
        freeze_feature_encoder: bool = True
        freeze_feature_projection: bool = False
        freeze_encoder: bool = False

    @dataclasses.dataclass
    class UnfreezeScheduleConfig:
        feature_encoder_steps: Optional[int] = None
        feature_projection_steps: Optional[int] = None
        encoder_steps: Optional[int] = None

    @dataclasses.dataclass
    class TransformerAcousticModelConfig:
        transformer: Any = None
        frontend: Any = None
        sequential_frontend: Any = None
        elementwise_affine: bool = False

    @dataclasses.dataclass
    class FrontendConfig:
        pass

    # Field names per the reference config (config.py) as consumed by
    # frontend.py:154-265 and TransformerAcousticModel.from_config (:729-759).
    @dataclasses.dataclass
    class DirectFrontendConfig(FrontendConfig):
        input_dropout: float = 0.0

    @dataclasses.dataclass
    class LinearFrontendConfig(FrontendConfig):
        neurons: int = 32
        input_dropout: float = 0.0

    @dataclasses.dataclass
    class Glu1dConfig:
        out_channels: int = 32
        kernel: int = 3
        stride: int = 1

    @dataclasses.dataclass
    class DropoutConfig:
        rate: float = 0.0

    @dataclasses.dataclass
    class LayerNormConfig:
        affine: bool = False

    @dataclasses.dataclass
    class MaxPoolingConfig:
        size: int = 2

    @dataclasses.dataclass
    class SequentialFrontendConfig:
        layers: List[Any] = dataclasses.field(default_factory=list)

    class BatchingMode(Enum):
        UTTERANCES = "utterances"
        FRAMES = "frames"

    @dataclasses.dataclass
    class Architecture:
        acoustic_model: Any = None
        projection: Any = None
        loss: Any = None

    for symbol in (
        FeatureSet, PhonemeLayerType, ProjectionEntryConfig, Config,
        MultiheadAttentionConfig, EmbeddingCompositionConfig, ProjectionConfig,
        Wav2Vec2PretrainedConfig, UnfreezeScheduleConfig,
        TransformerAcousticModelConfig, FrontendConfig, DirectFrontendConfig,
        LinearFrontendConfig, Glu1dConfig, DropoutConfig, LayerNormConfig,
        MaxPoolingConfig, SequentialFrontendConfig, BatchingMode, Architecture,
    ):
        setattr(module, symbol.__name__, symbol)
    return module


def load_reference_phonetics():
    """Returns ``(phonetic_features, phoneme_segmentation, utils)`` reference modules.

    Installs a fake ``allophant`` package whose ``__path__`` points at the
    read-only reference checkout, with the environment-blocked dependencies
    shimmed as documented in the module docstring. Idempotent.
    """
    global _cache
    if _cache is not None:
        return _cache
    if not reference_available():
        raise RuntimeError("reference checkout not mounted at /root/reference")

    package = types.ModuleType("allophant")
    package.__path__ = [str(_REFERENCE_PACKAGE)]
    # A really-imported package would carry this; consumers like
    # ``version(allophant.__package__)`` (predictions.py:46) rely on it.
    package.__package__ = "allophant"
    # Mirrors the reference package __init__ (allophant/__init__.py:1-5) without
    # executing files from the untrusted checkout at collection time.
    package.MAIN_LOGGER = logging.getLogger("allophant")
    package.MAIN_LOGGER.setLevel(logging.ERROR)
    sys.modules["allophant"] = package

    import allophant_tpu.phonemes as phonemes_shim
    import allophant_tpu.phonetics.language_codes as language_codes_shim

    sys.modules["allophant.phonemes"] = phonemes_shim
    sys.modules["allophant.language_codes"] = language_codes_shim
    sys.modules["allophant.config"] = _build_config_stub()

    package_data = types.ModuleType("allophant.package_data")
    package_data.ALLOPHOIBLE_PATH = _REFERENCE_PACKAGE / "package_data" / "allophoible.csv"
    package_data.DEFAULT_DIALECTS_PATH = _REFERENCE_PACKAGE / "package_data" / "default_dialects.json"
    package_data.PHONEME_REPLACEMENTS_PATH = (
        _REFERENCE_PACKAGE / "package_data" / "espeakng_phoneme_replacements.json"
    )
    package_data.DEFAULT_CONFIG_PATH = str(
        _REFERENCE_PACKAGE / "package_data" / "default_config.toml"
    )
    sys.modules["allophant.package_data"] = package_data

    if "panphon" not in sys.modules:
        sys.modules["panphon"] = types.ModuleType("panphon")

    # The reference pins an older pandas where the ReadCsvBuffer protocol lived in
    # pandas.io.parsers.readers (phonetic_features.py:19); this image's pandas keeps
    # it in pandas._typing. It is only used in type annotations.
    import pandas.io.parsers.readers as pandas_readers

    if not hasattr(pandas_readers, "ReadCsvBuffer"):
        try:
            from pandas._typing import ReadCsvBuffer
        except ImportError:  # annotation-only: any subscriptable placeholder works
            import typing

            ReadCsvBuffer = typing.IO
        pandas_readers.ReadCsvBuffer = ReadCsvBuffer

    utils = importlib.import_module("allophant.utils")
    segmentation = importlib.import_module("allophant.phoneme_segmentation")
    features = importlib.import_module("allophant.phonetic_features")
    # The reference targets pandas < 3 where ``read_csv(dtype=str)`` produced
    # object-dtype columns of python strings. Pandas 3's StringDtype rejects the
    # ndarray cells ``_binarize_contours`` assigns (phonetic_features.py:549-555).
    # Rewriting dtype=str -> dtype=object inside the reference module restores the
    # old column representation with byte-identical string values.
    features.pd = _PandasReadCsvCompat()
    _cache = (features, segmentation, utils)
    return _cache


def _stub_module(name: str) -> types.ModuleType:
    """A stub module with a proper (loader-less) ModuleSpec: transformers'
    ``_is_package_available`` probes ``importlib.util.find_spec`` for several of
    the packages stubbed here (phonemizer, torchaudio, ...), which raises
    ``ValueError`` on a sys.modules entry whose ``__spec__`` is None."""
    import importlib.machinery

    module = types.ModuleType(name)
    module.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return module


def _is_raw_field(field) -> bool:
    """True for fields declared via ``utils.schema_field(Raw(...))``."""
    import marshmallow

    return isinstance(field.metadata.get("marshmallow_field"), marshmallow.fields.Raw)


def _to_builtin(value):
    """Recursively converts dataclasses/enums to plain builtins — the observable
    dump semantics the real marshmallow-dataclass and mashumaro both produce for
    the reference's corpus/checkpoint types (field-name keyed maps, enum
    values)."""
    import dataclasses as _dataclasses
    import enum as _enum

    if _dataclasses.is_dataclass(value) and not isinstance(value, type):
        return {
            field.name: (
                getattr(value, field.name)
                if _is_raw_field(field)
                else _to_builtin(getattr(value, field.name))
            )
            for field in _dataclasses.fields(value)
        }
    if isinstance(value, _enum.Enum):
        return value.value
    if isinstance(value, (list, tuple)):
        return [_to_builtin(item) for item in value]
    if isinstance(value, dict):
        return {key: _to_builtin(item) for key, item in value.items()}
    return value


def _build_from_hint(hint, value):
    """Reconstructs a value of the hinted type from builtins (inverse of
    ``_to_builtin`` for the hint shapes the reference types use: Optional/Union,
    List, Dict, nested dataclasses, Enums; everything else passes through)."""
    import dataclasses as _dataclasses
    import enum as _enum
    import typing as _typing

    if value is None or hint is None:
        return value
    origin = _typing.get_origin(hint)
    args = _typing.get_args(hint)
    if origin is _typing.Union:
        for arg in args:
            if arg is type(None):
                continue
            try:
                return _build_from_hint(arg, value)
            except (TypeError, ValueError, KeyError):
                continue
        return value
    if origin in (list, tuple):
        item_hint = args[0] if args else None
        return [_build_from_hint(item_hint, item) for item in value]
    if origin is dict:
        value_hint = args[1] if len(args) == 2 else None
        return {key: _build_from_hint(value_hint, item) for key, item in value.items()}
    if isinstance(hint, type) and _dataclasses.is_dataclass(hint):
        return _instantiate_from_hints(hint, value)
    if isinstance(hint, type) and issubclass(hint, _enum.Enum):
        return hint(value)
    return value


def _instantiate_from_hints(cls, data):
    """Builds a dataclass instance from a builtin dict using its type hints;
    Raw-metadata fields pass through untouched, unknown keys are ignored."""
    import dataclasses as _dataclasses
    import typing as _typing

    try:
        hints = _typing.get_type_hints(cls)
    except Exception:
        hints = {}
    kwargs = {}
    for field in _dataclasses.fields(cls):
        if not isinstance(data, dict) or field.name not in data:
            continue
        raw = data[field.name]
        kwargs[field.name] = raw if _is_raw_field(field) else _build_from_hint(hints.get(field.name), raw)
    return cls(**kwargs)


def _ensure_marshmallow_dataclass_stub() -> types.ModuleType:
    """Installs (or extends) a ``marshmallow_dataclass`` stub.

    The reference uses the package for three things on the paths under test, none
    of which are code under test: ``@marshmallow_dataclass.dataclass`` /
    ``add_schema`` (attach a ``.Schema`` used only for state serialization) and
    ``class_schema`` (builds the tagged-union schema tables at import time, never
    exercised by the differential tests). ``add_schema`` attaches a functional
    dict-passthrough schema so ``WarmupScheduler.state_dict`` round-trips work
    (reference config.py:168-173)."""
    import dataclasses as _dataclasses

    import marshmallow

    md = sys.modules.get("marshmallow_dataclass")
    if md is None:
        md = types.ModuleType("marshmallow_dataclass")
        sys.modules["marshmallow_dataclass"] = md

    if not hasattr(md, "dataclass"):

        def _md_dataclass(cls=None, **_kwargs):
            def wrap(inner):
                decorated = _dataclasses.dataclass(inner)
                decorated.Schema = marshmallow.Schema
                return decorated

            return wrap(cls) if cls is not None else wrap

        md.dataclass = _md_dataclass

    if not hasattr(md, "add_schema"):

        def _add_schema(cls=None, **_kwargs):
            # Also called as a decorator factory (``@add_schema(base_schema=...)``,
            # mozilla_common_voice.py:83 — camel-casing for the download-meta
            # schema, not under test).
            if cls is None:
                return _add_schema

            class _FunctionalSchema:
                """Hint-driven functional replacement for the generated
                marshmallow-dataclass schema: dumps nested dataclasses/enums to
                builtins, passes ``schema_field(Raw())`` fields through
                untouched (the real Raw semantics — critical for
                ``Checkpoint.model_state`` and the corpus split's transcription
                objects), and loads by reconstructing nested types from the
                dataclass type hints."""

                def dump(self, obj):
                    out = {}
                    for field in _dataclasses.fields(cls):
                        value = getattr(obj, field.name)
                        out[field.name] = (
                            value if _is_raw_field(field) else _to_builtin(value)
                        )
                    return out

                def load(self, data):
                    return _instantiate_from_hints(cls, data)

            cls.Schema = _FunctionalSchema
            return cls

        md.add_schema = _add_schema

    if not hasattr(md, "class_schema"):
        md.class_schema = lambda _cls, **_kwargs: marshmallow.Schema

    return md


def _ensure_toml_stub() -> types.ModuleType:
    """Installs a ``toml`` stub backed by stdlib ``tomllib`` (the reference uses
    only ``toml.load`` on the paths under test, config.py / run.py)."""
    toml_module = sys.modules.get("toml")
    if toml_module is None:
        toml_module = types.ModuleType("toml")
        sys.modules["toml"] = toml_module

    if not hasattr(toml_module, "load"):

        def _toml_load(file):
            import tomllib

            if hasattr(file, "read"):
                return tomllib.loads(file.read())
            with open(file, "rb") as handle:
                return tomllib.load(handle)

        toml_module.load = _toml_load

    return toml_module


def _load_reference_file(module_name: str, relative_path: str):
    """Executes one reference source file under an out-of-package module name.

    Used where ``sys.modules["allophant.<name>"]`` already holds a stub that other
    reference modules rely on (config, batching): the real file still resolves its
    own absolute ``allophant.*`` imports through the fake package."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(module_name, _REFERENCE_PACKAGE / relative_path)
    assert spec is not None and spec.loader is not None
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    return module


def _ensure_dataset_processing_stub() -> types.ModuleType:
    """Installs a stub ``allophant.dataset_processing`` (the real one imports
    torchaudio). ``Batch`` carries the three fields the reference model layer
    reads (dataset_processing.py:49-85); the remaining names are referenced for
    annotations/isinstance only."""
    import dataclasses as _dataclasses

    processing = sys.modules.get("allophant.dataset_processing")
    if processing is None:
        processing = types.ModuleType("allophant.dataset_processing")
        sys.modules["allophant.dataset_processing"] = processing

    if not hasattr(processing, "Batch"):

        @_dataclasses.dataclass
        class Batch:
            audio_features: object
            lengths: object
            language_ids: object

        processing.Batch = Batch

    if not hasattr(processing, "BatchType"):
        # Real enum values (reference dataset_processing.py:165-168): the real
        # batching.py matches on these, so the annotation stub must carry them.
        processing.BatchType = Enum("BatchType", {"UNLABELED": 0, "RAW": 1, "INDEXED": 2})

    if not hasattr(processing, "LabeledBatch"):
        # Functional field layouts (reference dataset_processing.py:91-162):
        # the real batching.py _build_batch constructs these positionally.
        @_dataclasses.dataclass
        class RawLabeledBatch(processing.Batch):
            raw_labels: object = None
            utterance_ids: object = None

        @_dataclasses.dataclass
        class LabeledBatch(processing.Batch):
            attribute_indices: object = None
            label_lengths: object = None
            label_length_indices: object = None

        for cls in (RawLabeledBatch, LabeledBatch):
            cls.__class_getitem__ = classmethod(lambda target, _item: target)
        processing.RawLabeledBatch = RawLabeledBatch
        processing.LabeledBatch = LabeledBatch

    for name in (
        "PhonemeDataset",
        "SamplesProcessor",
        "TranscribedDataset",
        "PhoneticallySegmentedDataset",
    ):
        if not hasattr(processing, name):
            # Subscriptable so the reference's generic annotations (e.g.
            # ``PhonemeDataset[Any, Any, T]``, batching.py:269) evaluate.
            stub = type(name, (), {"__class_getitem__": classmethod(lambda cls, _item: cls)})
            setattr(processing, name, stub)

    if "allophant.batching" not in sys.modules:
        batching_module = types.ModuleType("allophant.batching")
        batching_module.Batch = processing.Batch
        sys.modules["allophant.batching"] = batching_module
    return processing


_config_cache: types.ModuleType | None = None


def load_reference_config():
    """Returns the reference's *real* ``config.py`` module (torch optimizers,
    ``WarmupScheduler``, ``OptimizerWrapper``), executed from the checkout.

    ``sys.modules["allophant.config"]`` keeps the lightweight stub (other
    reference modules import only a few symbols from it), so the real module is
    loaded under a private name. Stubbed import-time dependencies, none of them
    code under test: ``toml`` (used only inside ``Config.from_toml``),
    ``marshmallow_oneofschema.OneOfSchema`` / ``marshmallow_enum.EnumField``
    (schema machinery; the differential tests construct configs directly), and
    ``marshmallow_dataclass`` (see ``_ensure_marshmallow_dataclass_stub``).
    ``marshmallow`` itself and ``allophant.utils``/``loss_functions`` are real."""
    global _config_cache
    if _config_cache is not None:
        return _config_cache
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()

    _ensure_toml_stub()

    if "marshmallow_oneofschema" not in sys.modules:
        import marshmallow

        oneof = types.ModuleType("marshmallow_oneofschema")

        class OneOfSchema(marshmallow.Schema):
            type_field = "type"
            type_schemas: dict = {}

        oneof.OneOfSchema = OneOfSchema
        sys.modules["marshmallow_oneofschema"] = oneof

    if "marshmallow_enum" not in sys.modules:
        enum_module = types.ModuleType("marshmallow_enum")

        class EnumField:
            def __init__(self, *_args, **_kwargs):
                pass

        enum_module.EnumField = EnumField
        sys.modules["marshmallow_enum"] = enum_module

    _config_cache = _load_reference_file("allophant_reference_config", "config.py")
    return _config_cache


_batching_cache: types.ModuleType | None = None


def load_reference_batching():
    """Returns the reference's *real* ``batching.py`` module (samplers).

    The module imports ``Batch``/``LabeledBatch``/... and ``MultilingualCorpus``
    for type annotations and isinstance checks only; the sampler differential
    tests drive it with duck-typed corpora, so attribute-bare stubs suffice
    (the real ``dataset_processing``/``speech_corpus`` pull in torchaudio,
    absent from this image)."""
    global _batching_cache
    if _batching_cache is not None:
        return _batching_cache
    load_reference_phonetics()

    _ensure_dataset_processing_stub()
    _ensure_speech_corpus_stub()

    _batching_cache = _load_reference_file("allophant_reference_batching", "batching.py")
    return _batching_cache


def _ensure_speech_corpus_stub() -> types.ModuleType:
    """Installs a stub ``allophant.datasets.speech_corpus`` (the real one imports
    torchaudio/mutagen). All names are referenced by the modules under test for
    annotations only; stubs are generic-subscriptable so annotations like
    ``MultilingualCorpus[I, T]`` evaluate."""
    if "allophant.datasets" not in sys.modules:
        sys.modules["allophant.datasets"] = types.ModuleType("allophant.datasets")
    speech_corpus = sys.modules.get("allophant.datasets.speech_corpus")
    if speech_corpus is None:
        speech_corpus = types.ModuleType("allophant.datasets.speech_corpus")
        sys.modules["allophant.datasets.speech_corpus"] = speech_corpus
    for name in (
        "IndexedEntry",
        "LanguageInfo",
        "MultilingualCorpus",
        "MultilingualSplits",
        "PhoneticallySegmentedUtterance",
        "PhoneticallyTranscribedUtterance",
    ):
        if not hasattr(speech_corpus, name) or not hasattr(
            getattr(speech_corpus, name), "__class_getitem__"
        ):
            stub = type(name, (), {"__class_getitem__": classmethod(lambda cls, _item: cls)})
            setattr(speech_corpus, name, stub)
    return speech_corpus


_dataset_processing_cache: types.ModuleType | None = None


def load_reference_dataset_processing():
    """Returns the reference's *real* ``dataset_processing.py`` module
    (``PhonemeDataset``/``TranscribedDataset``/``PhoneticallySegmentedDataset``
    and the batch containers).

    The real module's only environment-blocked import is
    ``allophant.preprocessing`` (torchaudio transforms), referenced purely as the
    ``SamplesProcessor.feature_function`` annotation — stubbed. The speech-corpus
    names are annotation-only as well (tests drive the datasets with duck-typed
    corpora and precomputed features); ``allophant.phonetic_features`` is the
    real reference module, so label indexing runs the reference's own code."""
    global _dataset_processing_cache
    if _dataset_processing_cache is not None:
        return _dataset_processing_cache
    load_reference_phonetics()

    if "allophant.preprocessing" not in sys.modules:
        preprocessing = types.ModuleType("allophant.preprocessing")
        preprocessing.FeatureFunction = type("FeatureFunction", (), {})
        sys.modules["allophant.preprocessing"] = preprocessing

    _ensure_speech_corpus_stub()

    _dataset_processing_cache = _load_reference_file(
        "allophant_reference_dataset_processing", "dataset_processing.py"
    )
    return _dataset_processing_cache


_predictions_cache: types.ModuleType | None = None


def _ensure_torchaudio_decoder_stub() -> None:
    """Installs (or EXTENDS) the torchaudio stub with ``models.decoder``.

    Different differential suites stub different torchaudio corners — the
    corpus/audio tests install ``transforms``/``load``, this one
    ``models.decoder`` — and whichever fixture runs first used to win the
    ``sys.modules['torchaudio']`` slot wholesale: a full-suite run whose
    corpus tests preceded the decode tests then failed
    ``from torchaudio.models import decoder`` inside the reference's real
    predictions.py (the slim stub is a bare module, not a package). Every
    installer is therefore additive over one shared stub module."""
    from typing import Any, List, NamedTuple

    torchaudio = sys.modules.get("torchaudio")
    if torchaudio is None:
        torchaudio = _stub_module("torchaudio")
        sys.modules["torchaudio"] = torchaudio
    if "torchaudio.models.decoder" in sys.modules:
        return
    models = _stub_module("torchaudio.models")
    decoder_module = _stub_module("torchaudio.models.decoder")

    class CTCHypothesis(NamedTuple):
        # Field names/order per torchaudio.models.decoder.CTCHypothesis,
        # which the reference constructs positionally (predictions.py:206).
        tokens: Any
        words: List[str]
        score: Any
        timesteps: Any

    class CTCDecoder:  # annotation-only
        pass

    def ctc_decoder(*_args, **_kwargs):
        raise RuntimeError("flashlight beam decoder is unavailable in this image")

    decoder_module.CTCHypothesis = CTCHypothesis
    decoder_module.CTCDecoder = CTCDecoder
    decoder_module.ctc_decoder = ctc_decoder
    models.decoder = decoder_module
    torchaudio.models = models
    sys.modules["torchaudio.models"] = models
    sys.modules["torchaudio.models.decoder"] = decoder_module


def load_reference_predictions():
    """Returns the reference's *real* ``predictions.py`` module (greedy CTC
    decoder, prediction format constants, JSONL readers).

    Environment-blocked imports, stubbed (none are the code under test):
    ``torchaudio.models.decoder`` (flashlight beam decoder — ``CTCHypothesis``
    becomes a field-compatible NamedTuple, ``ctc_decoder`` raises if reached)
    and ``mashumaro`` (JSON mixin bases; the differential tests exercise the
    decoder, not mashumaro serialization). ``importlib.metadata.version`` is
    patched around the module exec because ``PredictionMetaData`` evaluates
    ``version("allophant")`` at class-definition time and the reference package
    is not installed in this image."""
    global _predictions_cache
    if _predictions_cache is not None:
        return _predictions_cache
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()

    _ensure_torchaudio_decoder_stub()

    # Additive over whatever mashumaro corners another suite already stubbed
    # (the corpus-interop fixtures install mixins.msgpack): first-wins
    # replacement of the root module broke full-suite ordering.
    if "mashumaro" not in sys.modules:
        sys.modules["mashumaro"] = _stub_module("mashumaro")
    if "mashumaro.mixins" not in sys.modules:
        sys.modules["mashumaro.mixins"] = _stub_module("mashumaro.mixins")
    mashumaro = sys.modules["mashumaro"]
    mixins = sys.modules["mashumaro.mixins"]
    if "mashumaro.mixins.json" not in sys.modules:
        mashumaro_types = _stub_module("mashumaro.types")

        class SerializationStrategy:
            def __init_subclass__(cls, **_kwargs):
                pass

        mashumaro_types.SerializationStrategy = SerializationStrategy
        mixins_json = _stub_module("mashumaro.mixins.json")

        class DataClassJSONMixin:
            """Functional JSON plumbing (the real mashumaro generates this); the
            reference's prediction dataclasses are flat enough that plain
            ``cls(**json.loads(...))`` reproduces the real decoder for the types
            the differential tests read (``UtterancePrediction``)."""

            @classmethod
            def from_json(cls, data):
                import json as _json

                return cls(**_json.loads(data))

            def to_json(self):
                import dataclasses as _dataclasses
                import json as _json

                return _json.dumps(_dataclasses.asdict(self))

        mixins_json.DataClassJSONMixin = DataClassJSONMixin
        sys.modules["mashumaro"] = mashumaro
        sys.modules["mashumaro.types"] = mashumaro_types
        sys.modules["mashumaro.mixins"] = mixins
        sys.modules["mashumaro.mixins.json"] = mixins_json

    import importlib.metadata as importlib_metadata

    original_version = importlib_metadata.version

    def _patched_version(name):
        if name == "allophant":
            return "0.0-reference-checkout"
        return original_version(name)

    importlib_metadata.version = _patched_version
    try:
        _predictions_cache = _load_reference_file("allophant_reference_predictions", "predictions.py")
    finally:
        importlib_metadata.version = original_version
    return _predictions_cache


def load_reference_attribute_graph():
    """Returns the reference's real ``attribute_graph`` module without pulling in
    the torch model layer (cheap subset of ``load_reference_network``)."""
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()
    return importlib.import_module("allophant.attribute_graph")


_network_cache: tuple | None = None


def load_reference_network():
    """Returns ``(acoustic_model, frontend, attribute_graph)`` reference modules.

    Imports the reference's torch *model layer* (/root/reference/allophant/network/)
    on top of the phonetics shim: torch and HF transformers are present in this
    image, so the modules under test run unmodified. Additional shims, none of
    which are code under test:

    - ``marshmallow_dataclass`` — used only to attach a ``.Schema`` to the
      attribute-graph serialization dataclass (attribute_graph.py:202-224);
      stubbed with stdlib dataclass + a plain marshmallow Schema.
    - ``allophant.dataset_processing`` / ``allophant.batching`` — the model layer
      imports only the ``Batch`` container from them (the real modules pull in
      torchaudio); stubbed with an attribute-compatible dataclass.
    - ``allophant.config`` — extended stub (see ``_build_config_stub``).
    """
    global _network_cache
    if _network_cache is not None:
        return _network_cache
    load_reference_phonetics()

    _ensure_marshmallow_dataclass_stub()
    _ensure_dataset_processing_stub()

    import importlib as _importlib

    attribute_graph = _importlib.import_module("allophant.attribute_graph")
    frontend = _importlib.import_module("allophant.network.frontend")
    acoustic_model = _importlib.import_module("allophant.network.acoustic_model")
    _network_cache = (acoustic_model, frontend, attribute_graph)
    return _network_cache


_evaluation_cache: types.ModuleType | None = None


def load_reference_evaluation():
    """Returns the reference's *real* ``evaluation.py`` module
    (``EvaluationResults``/``MultilingualEvaluationResults`` — the containers and
    formatting behind every published PER/AER table).

    ``package_version`` evaluates ``version("allophant")`` at class-definition
    time; the reference package is not installed, so ``importlib.metadata.version``
    is patched around the import (same treatment as ``load_reference_predictions``).
    The module registers naturally as ``allophant.evaluation`` so the reference's
    ``run.py`` reuses it."""
    global _evaluation_cache
    if _evaluation_cache is not None:
        return _evaluation_cache
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()

    import importlib.metadata as importlib_metadata

    original_version = importlib_metadata.version

    def _patched_version(name):
        if name == "allophant":
            return "0.0-reference-checkout"
        return original_version(name)

    importlib_metadata.version = _patched_version
    try:
        _evaluation_cache = importlib.import_module("allophant.evaluation")
    finally:
        importlib_metadata.version = original_version
    return _evaluation_cache


_error_rates_cache: types.ModuleType | None = None


def load_reference_error_rates():
    """Returns the reference's *real* ``get_attribute_error_rates.py`` module
    (the per-attribute/AER aggregation script producing the published tables)."""
    global _error_rates_cache
    if _error_rates_cache is not None:
        return _error_rates_cache
    load_reference_evaluation()
    _error_rates_cache = _load_reference_file(
        "allophant_reference_error_rates", "get_attribute_error_rates.py"
    )
    return _error_rates_cache


def _ensure_mashumaro_msgpack_stub() -> None:
    """Extends the mashumaro stub with a functional
    ``mashumaro.mixins.msgpack.DataClassMessagePackMixin`` (the real package is
    absent from this image): ``to_msgpack`` packs the hint-driven builtin dump
    (field-name keyed maps, mashumaro's documented msgpack default) and
    ``from_msgpack`` reconstructs through the dataclass type hints — the same
    observable byte format the reference's corpus files use (ExtType payloads,
    mozilla_common_voice.py:144-155)."""
    if "mashumaro" not in sys.modules:
        sys.modules["mashumaro"] = _stub_module("mashumaro")
    if "mashumaro.mixins" not in sys.modules:
        sys.modules["mashumaro.mixins"] = _stub_module("mashumaro.mixins")
    if "mashumaro.mixins.msgpack" in sys.modules:
        return

    import msgpack as _msgpack

    msgpack_module = _stub_module("mashumaro.mixins.msgpack")

    class DataClassMessagePackMixin:
        def to_msgpack(self) -> bytes:
            return _msgpack.packb(_to_builtin(self), use_bin_type=True)

        @classmethod
        def from_msgpack(cls, data: bytes):
            return _instantiate_from_hints(cls, _msgpack.unpackb(data, raw=False))

        def to_dict(self):
            return _to_builtin(self)

        @classmethod
        def from_dict(cls, data):
            return _instantiate_from_hints(cls, data)

    msgpack_module.DataClassMessagePackMixin = DataClassMessagePackMixin
    sys.modules["mashumaro.mixins.msgpack"] = msgpack_module


def _ensure_audio_backend_stubs() -> None:
    """torchaudio.transforms.Resample and mutagen.File module stubs (call-time
    dependencies of the real speech_corpus.py; never exercised by the corpus
    (de)serialization paths under test)."""
    if "torchaudio" not in sys.modules:
        sys.modules["torchaudio"] = _stub_module("torchaudio")
    torchaudio = sys.modules["torchaudio"]
    if "torchaudio.transforms" not in sys.modules:
        transforms = _stub_module("torchaudio.transforms")

        class Resample:
            def __init__(self, *_args, **_kwargs):
                raise RuntimeError("torchaudio is unavailable in this image")

        transforms.Resample = Resample
        torchaudio.transforms = transforms
        sys.modules["torchaudio.transforms"] = transforms
    if not hasattr(torchaudio, "load"):
        def _unavailable_load(*_args, **_kwargs):
            raise RuntimeError("torchaudio is unavailable in this image")

        torchaudio.load = _unavailable_load
    if "mutagen" not in sys.modules:
        mutagen = _stub_module("mutagen")

        def _mutagen_file(*_args, **_kwargs):
            raise RuntimeError("mutagen is unavailable in this image")

        mutagen.File = _mutagen_file
        sys.modules["mutagen"] = mutagen


def _ensure_g2p_backend_stubs() -> None:
    """stanza/epitran/phonemizer module stubs satisfying the import surface of
    the real datasets/phonemes.py (G2P engines construct these at call time
    only; the transcription data types under test never touch them)."""
    if "stanza" not in sys.modules:
        stanza = _stub_module("stanza")
        resources = _stub_module("stanza.resources")
        common = _stub_module("stanza.resources.common")
        common.DEFAULT_MODEL_DIR = "/nonexistent"

        class Pipeline:
            def __init__(self, *_args, **_kwargs):
                raise RuntimeError("stanza is unavailable in this image")

        stanza.Pipeline = Pipeline
        resources.common = common
        stanza.resources = resources
        sys.modules["stanza"] = stanza
        sys.modules["stanza.resources"] = resources
        sys.modules["stanza.resources.common"] = common
    if "epitran" not in sys.modules:
        epitran = _stub_module("epitran")
        backoff = _stub_module("epitran.backoff")
        meta = _stub_module("epitran.meta")

        class _Unavailable:
            def __init__(self, *_args, **_kwargs):
                raise RuntimeError("epitran is unavailable in this image")

        for name in ("Backoff", "PuncNorm", "StripDiacritics", "XSampa"):
            setattr(backoff, name, type(name, (_Unavailable,), {}))
        backoff.panphon = _stub_module("epitran.backoff.panphon")
        epitran.Epitran = type("Epitran", (_Unavailable,), {})
        epitran.meta = meta
        epitran.backoff = backoff
        sys.modules["epitran"] = epitran
        sys.modules["epitran.backoff"] = backoff
        sys.modules["epitran.meta"] = meta
    if "phonemizer" not in sys.modules:
        phonemizer = _stub_module("phonemizer")
        backend = _stub_module("phonemizer.backend")
        separator = _stub_module("phonemizer.separator")

        class EspeakBackend:
            def __init__(self, *_args, **_kwargs):
                raise RuntimeError("phonemizer is unavailable in this image")

        class Separator:
            def __init__(self, *_args, **_kwargs):
                pass

        backend.EspeakBackend = EspeakBackend
        separator.Separator = Separator
        phonemizer.backend = backend
        phonemizer.separator = separator
        sys.modules["phonemizer"] = phonemizer
        sys.modules["phonemizer.backend"] = backend
        sys.modules["phonemizer.separator"] = separator


_common_voice_cache: types.ModuleType | None = None


def load_reference_common_voice():
    """Returns the reference's *real* ``datasets/mozilla_common_voice.py`` module
    — the corpus (de)serialization code (``CommonVoiceCorpus.save``/``from_file``
    with the msgpack ExtType codecs, ``.corpus_path`` indirection, inventories
    JSON; reference mozilla_common_voice.py:331-454) plus the real
    ``datasets/phonemes.py`` transcription data types and the real
    ``datasets/speech_corpus.py`` corpus containers it builds on, all under
    their canonical module names (VERDICT r3 item 5: corpus-file interop).

    Environment-blocked imports, stubbed (none are the serialization code under
    test): mashumaro's msgpack mixin (functional hint-driven replacement with
    mashumaro's documented field-name-map byte format), torchaudio/mutagen
    (audio loading, call-time only), stanza/epitran/phonemizer (G2P engine
    construction, call-time only), marshmallow_dataclass (functional
    Raw-preserving schema stub — see ``_ensure_marshmallow_dataclass_stub``)."""
    global _common_voice_cache
    if _common_voice_cache is not None:
        return _common_voice_cache
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()
    _ensure_mashumaro_msgpack_stub()
    _ensure_g2p_backend_stubs()
    _ensure_audio_backend_stubs()

    if "allophant.datasets" not in sys.modules:
        sys.modules["allophant.datasets"] = types.ModuleType("allophant.datasets")

    # Real transcription data types + real corpus containers, canonical names.
    # (Replaces the annotation-only speech_corpus stub if one was installed:
    # the real module is attribute-superset-compatible with it.)
    if getattr(sys.modules.get("allophant.datasets.phonemes"), "__file__", None) is None:
        phonemes = _load_reference_file("allophant_reference_datasets_phonemes", "datasets/phonemes.py")
        sys.modules["allophant.datasets.phonemes"] = phonemes
        sys.modules["allophant.datasets"].phonemes = phonemes
    if getattr(sys.modules.get("allophant.datasets.speech_corpus"), "__file__", None) is None:
        speech_corpus = _load_reference_file(
            "allophant_reference_speech_corpus", "datasets/speech_corpus.py"
        )
        sys.modules["allophant.datasets.speech_corpus"] = speech_corpus
        sys.modules["allophant.datasets"].speech_corpus = speech_corpus

    import importlib.metadata as importlib_metadata

    original_version = importlib_metadata.version

    def _patched_version(name):
        if name == "allophant":
            return "0.0-reference-checkout"
        return original_version(name)

    importlib_metadata.version = _patched_version
    try:
        _common_voice_cache = _load_reference_file(
            "allophant_reference_common_voice", "datasets/mozilla_common_voice.py"
        )
    finally:
        importlib_metadata.version = original_version
    sys.modules.setdefault("allophant.datasets.mozilla_common_voice", _common_voice_cache)
    return _common_voice_cache


_estimator_cache: types.ModuleType | None = None


def load_reference_estimator():
    """Returns the reference's *real* ``estimator.py`` module — the training-loop
    runtime (``TrainingRun`` with its gradient-accumulation drain and validation
    cadence, ``EarlyStopping``, ``EpochPosition``/``EpochStatistics``,
    ``Checkpoint``, ``split_batch_size``) executed from the checkout
    (reference estimator.py:108-928). This was the last major reference module
    never run as a differential oracle (VERDICT r3 item 4).

    Everything heavyweight it imports is real in this image: torch,
    ``torch.utils.tensorboard``, tqdm, transformers, marshmallow. Stubbed
    import-time dependencies, none of them code under test:

    - ``marshmallow_dataclass`` (see ``_ensure_marshmallow_dataclass_stub``) —
      attaches a dict-passthrough ``Checkpoint.Schema``; the field *layout* under
      test comes from the dataclass itself.
    - ``allophant.config`` — the canonical stub module, extended with the *real*
      ``OptimizerWrapper``/``WarmupInfo``/``ProfilingConfig`` classes from the
      reference's own config.py (``load_reference_config``), so the optimizer
      machinery the loop drives is the reference's.
    - ``allophant.dataset_processing`` / ``allophant.datasets.speech_corpus`` —
      annotation-only stubs (the real modules pull in torchaudio); tests drive
      ``TrainingRun`` with duck-typed dataset managers and batches.
    - ``allophant.batching`` — the reference's *real* batching module symbols
      (``load_reference_batching``), annotation-only in the loop.

    ``TrainingRun.__init__`` calls ``cuda.get_device_properties(0)``
    (estimator.py:510) unconditionally; CPU-only tests must patch
    ``torch.cuda.get_device_properties`` before constructing one."""
    global _estimator_cache
    if _estimator_cache is not None:
        return _estimator_cache
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()

    real_config = load_reference_config()
    config_stub = sys.modules["allophant.config"]
    for name in ("OptimizerWrapper", "ProfilingConfig", "WarmupInfo"):
        if not hasattr(config_stub, name):
            setattr(config_stub, name, getattr(real_config, name))

    _ensure_dataset_processing_stub()
    _ensure_speech_corpus_stub()
    speech_corpus = sys.modules["allophant.datasets.speech_corpus"]
    for name in ("AudioInfo", "SplitMetaData"):
        if not hasattr(speech_corpus, name):
            stub = type(name, (), {"__class_getitem__": classmethod(lambda cls, _item: cls)})
            setattr(speech_corpus, name, stub)

    # Real torch model layer (Allophant, Predictions, UnfreezeSchedule) under
    # the canonical names.
    load_reference_network()

    # Real batching symbols (Batch/Batcher/LabeledBatch) on the canonical module.
    batching = load_reference_batching()
    canonical_batching = sys.modules["allophant.batching"]
    for name in ("Batch", "Batcher", "LabeledBatch"):
        if not hasattr(canonical_batching, name):
            setattr(canonical_batching, name, getattr(batching, name))

    _estimator_cache = _load_reference_file("allophant_reference_estimator", "estimator.py")
    return _estimator_cache


_run_cache: types.ModuleType | None = None


def load_reference_run():
    """Returns the reference's *real* ``run.py`` module — specifically for its
    evaluation pipeline (``EvaluationProcessor``, ``_compute_edit_statistics``,
    ``evaluate``, ``_make_source_maps``/``_missing_mappings``), the exact code
    behind the published PER/AER numbers (run.py:280-499).

    The train/predict halves of ``run.py`` pull in the whole torch stack; their
    imports are satisfied so the module executes, but only the evaluation paths
    are code under test. Environment-blocked imports, stubbed (annotation/other-
    subcommand use only): ``allophant.estimator`` (torchaudio),
    ``allophant.datasets.corpus_loading`` (torchaudio), the dataset-processing/
    speech-corpus names (extended stubs), ``Batcher`` and ``toml``. torch,
    tensorboard and tqdm are real in this image; ``allophant.predictions`` and
    ``allophant.evaluation`` are the reference's own files loaded via their
    dedicated shims."""
    global _run_cache
    if _run_cache is not None:
        return _run_cache
    load_reference_phonetics()
    _ensure_marshmallow_dataclass_stub()
    load_reference_evaluation()

    predictions = load_reference_predictions()
    sys.modules.setdefault("allophant.predictions", predictions)

    _ensure_dataset_processing_stub()
    _ensure_speech_corpus_stub()

    if "allophant.preprocessing" not in sys.modules:
        preprocessing = types.ModuleType("allophant.preprocessing")
        preprocessing.FeatureFunction = type("FeatureFunction", (), {})
        sys.modules["allophant.preprocessing"] = preprocessing

    _ensure_toml_stub()

    if "allophant.datasets.corpus_loading" not in sys.modules:
        corpus_loading = types.ModuleType("allophant.datasets.corpus_loading")
        sys.modules["allophant.datasets.corpus_loading"] = corpus_loading
        datasets_package = sys.modules["allophant.datasets"]
        datasets_package.corpus_loading = corpus_loading

    if "allophant.estimator" not in sys.modules:
        estimator = types.ModuleType("allophant.estimator")
        for name in (
            "EpochPosition",
            "Estimator",
            "DatasetManager",
            "Checkpoint",
            "TrainDevFeatures",
            "TrainDevLengths",
        ):
            setattr(
                estimator,
                name,
                type(name, (), {"__class_getitem__": classmethod(lambda cls, _item: cls)}),
            )
        sys.modules["allophant.estimator"] = estimator

    batching = sys.modules.get("allophant.batching")
    if batching is not None and not hasattr(batching, "Batcher"):
        batching.Batcher = type("Batcher", (), {})

    _run_cache = _load_reference_file("allophant_reference_run", "run.py")
    return _run_cache


class _PandasReadCsvCompat(types.ModuleType):
    """Pandas proxy whose ``read_csv(dtype=str)`` yields pre-3.0 object columns."""

    def __init__(self):
        super().__init__("pandas")

    def read_csv(self, *args, **kwargs):
        import pandas

        if kwargs.get("dtype") is str:
            kwargs["dtype"] = object
        return pandas.read_csv(*args, **kwargs)

    def __getattr__(self, name):
        import pandas

        return getattr(pandas, name)
