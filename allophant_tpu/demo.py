"""Self-contained demo/bench assets: a synthetic Allophoible-format feature table and
flagship model builders.

The real Allophoible database is not bundled (released checkpoints embed their own
copy), so benchmarks and the graft entry build the full-size flagship (XLS-R 300m
encoder + multitask attribute head with allophone layer and embedding composition)
over a small synthetic phoneme inventory by default. The classifier head is a tiny
fraction of the FLOPs, so throughput numbers are representative of real-table
deployments — measured directly with ``num_segments=2500`` (a 2,409-phoneme
inventory built from diacritic combinations): 3,349 vs 3,382 audio-sec/s on one
v5e chip, a 1% difference."""

from __future__ import annotations

from io import StringIO
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

# The full PHOIBLE feature column set the reference's default config classifies
# over ("tone" is a feature column but not a classifier): 36 attribute heads +
# the phoneme head = the reference's 37 classifiers
# (/root/reference/allophant/package_data/default_config.toml:61-99).
DEMO_FEATURES = [
    "tone",
    "stress",
    "syllabic",
    "short",
    "long",
    "consonantal",
    "sonorant",
    "continuant",
    "delayedRelease",
    "approximant",
    "tap",
    "trill",
    "nasal",
    "lateral",
    "labial",
    "round",
    "labiodental",
    "coronal",
    "anterior",
    "distributed",
    "strident",
    "dorsal",
    "high",
    "low",
    "front",
    "back",
    "tense",
    "retractedTongueRoot",
    "advancedTongueRoot",
    "periodicGlottalSource",
    "epilaryngealSource",
    "spreadGlottis",
    "constrictedGlottis",
    "fortis",
    "raisedLarynxEjective",
    "loweredLarynxImplosive",
    "click",
]

_METADATA_COLUMNS = [
    "InventoryID",
    "Glottocode",
    "ISO6393",
    "LanguageName",
    "SpecificDialect",
    "GlyphID",
    "Phoneme",
    "Allophones",
    "Marginal",
    "SegmentClass",
    "Source",
]

_BASE_SEGMENTS = [
    "a", "e", "i", "o", "u", "y", "ə", "ɛ", "ɔ", "ɪ", "ʊ",
    "p", "b", "t", "d", "k", "ɡ", "q", "ʔ",
    "m", "n", "ɲ", "ŋ",
    "f", "v", "s", "z", "ʃ", "ʒ", "x", "h",
    "l", "r", "ɾ", "j", "w",
    "t͡ʃ", "d͡ʒ", "t͡s",
]


_DIACRITICS = ["ʰ", "ʲ", "ʷ", "ː", "̃", "̥", "̤", "˞"]


def _synthetic_segments(total: int) -> List[str]:
    """The base IPA-ish segments, extended with diacritic combinations up to
    ``total`` distinct segments (for full-Allophoible-scale benchmarking).
    ``total`` below the base-set size returns the whole base set."""
    capacity = len(_BASE_SEGMENTS) * (1 + len(_DIACRITICS) + len(_DIACRITICS) * (len(_DIACRITICS) - 1))
    if total > capacity:
        raise ValueError(f"num_segments {total} exceeds the synthetic capacity of {capacity}")
    segments = list(_BASE_SEGMENTS)
    for first in _DIACRITICS:
        for base in _BASE_SEGMENTS:
            if len(segments) >= total:
                return segments
            segments.append(base + first)
    for first in _DIACRITICS:
        for second in _DIACRITICS:
            if first == second:
                continue
            for base in _BASE_SEGMENTS:
                if len(segments) >= total:
                    return segments
                segments.append(base + first + second)
    return segments


def demo_feature_table_csv(num_languages: int = 8, seed: int = 0, num_segments: int | None = None) -> str:
    """Generates a deterministic synthetic Allophoible-format CSV: ~40 segments
    (or ``num_segments`` via diacritic combinations, up to full Allophoible
    scale) with random-but-consistent feature assignments shared across
    `num_languages` language inventories (subsets), with a few allophone
    relations."""
    rng = np.random.default_rng(seed)
    segments = _synthetic_segments(num_segments) if num_segments else list(_BASE_SEGMENTS)
    values = ["+", "-", "0"]
    feature_rows = {}
    for segment in segments:
        feature_rows[segment] = ["-"] + [values[rng.integers(0, 3)] for _ in DEMO_FEATURES[1:]]

    language_codes = [
        "spa", "ita", "deu", "fra", "por", "rus", "tur", "fin", "pol", "nld",
        "swe", "ces", "ell", "hun", "ron", "dan",
    ][:num_languages]

    rows = []
    for index, language in enumerate(language_codes, start=1):
        inventory_size = int(rng.integers(25, len(segments)))
        inventory = list(rng.choice(segments, size=inventory_size, replace=False))
        for phoneme in inventory:
            allophones = phoneme
            # A few multi-allophone relations per language.
            if rng.random() < 0.2:
                other = segments[int(rng.integers(0, len(segments)))]
                allophones = f"{phoneme} {other}"
            rows.append(
                {
                    "InventoryID": index,
                    "Glottocode": f"{language}1234",
                    "ISO6393": language,
                    "LanguageName": language,
                    "SpecificDialect": "",
                    "GlyphID": "+".join(f"{ord(c):04X}" for c in phoneme),
                    "Phoneme": phoneme,
                    "Allophones": allophones,
                    "Marginal": "FALSE",
                    "SegmentClass": "vowel" if phoneme[0] in "aeiouyəɛɔɪʊ" else "consonant",
                    "Source": "demo",
                    **dict(zip(DEMO_FEATURES, feature_rows[phoneme])),
                }
            )
    # Feature bank: every segment as a marginal row so allophone references resolve.
    for phoneme in segments:
        rows.append(
            {
                "InventoryID": 999,
                "Glottocode": "",
                "ISO6393": "mis",
                "LanguageName": "FeatureBank",
                "SpecificDialect": "",
                "GlyphID": "+".join(f"{ord(c):04X}" for c in phoneme),
                "Phoneme": phoneme,
                "Allophones": phoneme,
                "Marginal": "TRUE",
                "SegmentClass": "vowel" if phoneme[0] in "aeiouyəɛɔɪʊ" else "consonant",
                "Source": "demo",
                **dict(zip(DEMO_FEATURES, feature_rows[phoneme])),
            }
        )

    frame = pd.DataFrame(rows, columns=_METADATA_COLUMNS + DEMO_FEATURES)
    buffer = StringIO()
    frame.to_csv(buffer, index=False)
    return buffer.getvalue()


def demo_config_dict(
    phoneme_layer: str = "allophones",
    embedding_size: int = 640,
    languages: Optional[List[str]] = None,
) -> dict:
    """Full training config over the demo feature set (flagship XLS-R encoder)."""
    classes = [{"name": name, "dependencies": ["OUTPUT"]} for name in DEMO_FEATURES[1:]]
    classes.append({"name": "phoneme", "dependencies": ["OUTPUT"]})
    return {
        "nn": {
            "batch_size": 1_600_000,
            "batching_mode": "frames",
            "accumulation_factor": 1,
            "projection": {
                "classes": classes,
                "feature_set": "phoible",
                "phoneme_layer": phoneme_layer,
                "acoustic_model_dropout": 0.2,
                "allophone_l2_alpha": 10.0,
                "embedding_composition": {"embedding_size": embedding_size},
            },
            "acoustic_model": {
                "type": "wav2vec2-pretrained",
                "model_id": "facebook/wav2vec2-xls-r-300m",
            },
            "optimizer": {"algorithm": "adam", "learning_rate": 0.001},
            "loss": {"type": "CTC"},
            "lr_schedule": {"type": "warmup", "warmup_steps": 2500, "constant_steps": 10000, "factor": 2},
            "clip_norm": 1.0,
            "seed": 2,
            "mixed_precision": True,
        },
        "preprocessing": {"feature_type": "RAW", "resample": 16000},
        "data": {"languages": languages or ["es", "it", "de", "fr"]},
    }


def build_flagship(
    num_languages: int = 4,
    wav2vec2_architecture=None,
    dtype=None,
    phoneme_layer: str = "allophones",
    remat: bool = False,
    num_segments: int | None = None,
    remat_save_names: tuple | None = None,
    head_dtype=None,
    f32_matmul_precision: str = "highest",
):
    """Builds the flagship model (XLS-R 300m encoder unless overridden) over the demo
    table. Returns (config, indexer, built_model)."""
    import jax.numpy as jnp

    from allophant_tpu.config import Config
    from allophant_tpu.models.allophant import attribute_graph_from_config, build_model
    from allophant_tpu.phonetics.features import LanguageInventories, PhoneticAttributeIndexer

    if dtype is None:
        dtype = jnp.float32

    table = demo_feature_table_csv(num_segments=num_segments)
    config = Config.load(demo_config_dict(phoneme_layer=phoneme_layer))
    language_codes = ["es", "it", "de", "fr", "pt", "ru", "tr", "fi"][:num_languages]

    # The synthetic table's singleton feature columns (e.g. "tone", all "-") are
    # structural to the demo, and the bench/dryrun entry points construct several
    # indexers — suppress just that category here so real warnings stay visible
    # in bench/dryrun tails.
    import warnings

    from allophant_tpu.phonetics.features import SingletonFeatureWarning

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SingletonFeatureWarning)
        # Build per-language inventories from the demo table.
        bootstrap = PhoneticAttributeIndexer("phoible", table)
        inventories = LanguageInventories(
            {
                index: bootstrap.phoneme_inventory(code)
                for index, code in enumerate(language_codes)
            },
            language_codes,
        )
        indexer = PhoneticAttributeIndexer.from_config(config, table, inventories)
    graph = attribute_graph_from_config(config, indexer)
    kwargs = {}
    if remat_save_names is not None:
        kwargs["remat_save_names"] = remat_save_names
    built = build_model(
        config.nn,
        feature_size=1,
        sample_rate=16_000,
        attribute_graph=graph,
        attribute_indexer=indexer,
        wav2vec2_architecture=wav2vec2_architecture,
        dtype=dtype,
        remat=remat,
        head_dtype=head_dtype,
        f32_matmul_precision=f32_matmul_precision,
        **kwargs,
    )
    return config, indexer, built
