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

    module.FeatureSet = FeatureSet
    module.PhonemeLayerType = PhonemeLayerType
    module.ProjectionEntryConfig = ProjectionEntryConfig
    module.Config = Config
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
